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
