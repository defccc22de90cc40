"""HuffWord round trips (reference func_test pattern,
unit_tests/test_huffword.cc:49-84)."""

import numpy as np
import pytest

from glz_tpu import compress, decompress
from glz_tpu import config as cfg


def test_huffword_roundtrip_text(text_100kb):
    blob = compress(text_100kb, mode=cfg.MODE_HUFFWORD)
    assert decompress(blob) == text_100kb


def test_huffword_beats_byte_mode_on_text(text_1mb):
    word = compress(text_1mb, mode=cfg.MODE_HUFFWORD)
    byte = compress(text_1mb, mode=cfg.MODE_BYTE)
    assert decompress(word) == text_1mb
    # word-based Huffman should compress repetitive English-like text better
    assert len(word) < len(byte)


@pytest.mark.parametrize("payload", [
    b"", b"a", b"-", b"hello", b"  ", b"he's-", b"a-", b"-a",
    b"word " * 50, b"\xff\xfe binary-ish \x00\x01",
])
def test_huffword_edges(payload):
    blob = compress(payload, mode=cfg.MODE_HUFFWORD)
    assert decompress(blob) == payload


def test_huffword_small_streams(text_100kb):
    conf = cfg.GlzConfig(stream_symbols=256)
    blob = compress(text_100kb, mode=cfg.MODE_HUFFWORD, conf=conf)
    assert decompress(blob) == text_100kb


def test_huffword_decoder_variants(text_100kb):
    """The three host decode strategies (reference parity,
    canonical_huffword.h:536-841) must agree bit-exactly."""
    from glz_tpu import compress, decompress
    from glz_tpu import config as cfg

    data = text_100kb[:20_000]
    blob = compress(data, mode=cfg.MODE_HUFFWORD,
                    conf=cfg.GlzConfig(stream_symbols=256))
    for variant in (cfg.DECODER_TABLE, cfg.DECODER_FAST, cfg.DECODER_BITWALK):
        assert decompress(blob, variant=variant) == data, variant


# ---- r5: lockstep requests are always honored (no silent layout fallback)

def test_lockstep_single_token_honored():
    """An all-word input (one token, empty non-word dictionary) explicitly
    requesting the lockstep layout must produce a layout-2 container (r4
    review: it silently fell back to a bitstream container) and round-trip."""
    from glz_tpu import compress, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container

    data = b"abcdefgh" * 200  # one single word token: non-word dict empty
    conf = GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)
    blob = compress(data, mode=MODE_HUFFWORD, conf=conf)
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == data


def test_lockstep_single_nonword_token_honored():
    from glz_tpu import compress, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container

    data = b" \t\n.," * 100  # one non-word token: word dict empty
    conf = GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)
    blob = compress(data, mode=MODE_HUFFWORD, conf=conf)
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == data


def test_lockstep_empty_input_honored():
    from glz_tpu import compress, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container

    conf = GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)
    blob = compress(b"", mode=MODE_HUFFWORD, conf=conf)
    assert container.read_container(blob).layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == b""


def test_group_rows_cap_warns():
    """The dual kernel's VMEM cap on group_rows is loud (r4 review weak #3:
    it silently downgraded the requested geometry)."""
    import pytest

    from glz_tpu import compress, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container

    data = b"word one two three four five six seven eight nine ten " * 400
    conf = GlzConfig(stream_symbols=1024, layout=LAYOUT_LOCKSTEP,
                     group_rows=64)
    with pytest.warns(UserWarning, match="VMEM budget"):
        blob = compress(data, mode=MODE_HUFFWORD, conf=conf)
    f = container.read_container(blob)
    assert f.group_rows == 16  # pack2 cap: (1<<14)//1024
    assert decompress(blob) == data


def test_rows_cap_shared_between_paths():
    """huffword_rows_cap is the single source for both the device path and
    the multihost planner (r4 review weak #7: two hand-coded bounds)."""
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.models.huffword import huffword_rows_cap
    from glz_tpu.parallel.multihost import huffword_multihost_rows

    for S in (64, 128, 256, 512, 1024):
        conf = GlzConfig(stream_symbols=S, layout=LAYOUT_LOCKSTEP,
                         group_rows=64)
        assert huffword_multihost_rows(conf) == min(
            64, huffword_rows_cap(S, pack2=False))
