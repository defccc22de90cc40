"""utils/crc.crc32_combine — the GF(2) checksum stitch for multihost
containers (the reference has no integrity checking at all; SURVEY.md §5)."""

import zlib

import numpy as np
import pytest

from glz_tpu.utils.crc import crc32_combine, crc32_concat


def test_combine_matches_zlib(rng):
    for _ in range(25):
        la = int(rng.integers(0, 3000))
        lb = int(rng.integers(0, 3000))
        a = rng.integers(0, 256, la, dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, lb, dtype=np.uint8).tobytes()
        assert crc32_combine(zlib.crc32(a), zlib.crc32(b), lb) == zlib.crc32(a + b)


def test_combine_empty_halves():
    a = b"hello"
    assert crc32_combine(zlib.crc32(a), zlib.crc32(b""), 0) == zlib.crc32(a)
    assert crc32_combine(zlib.crc32(b""), zlib.crc32(a), 5) == zlib.crc32(a)


def test_concat_many_shards(rng):
    parts = [rng.integers(0, 256, int(rng.integers(0, 5000)),
                          dtype=np.uint8).tobytes() for _ in range(7)]
    got = crc32_concat([zlib.crc32(p) for p in parts],
                       [len(p) for p in parts])
    assert got == zlib.crc32(b"".join(parts))


def test_combine_large_length(rng):
    """Shard lengths way past 2^32 exercise the high shift matrices; verify
    against an incremental zlib crc over the same (sparse) stream: crc of
    a + zeros(n) + b equals combine(combine(crc_a, crc_zeros, n), crc_b)."""
    a = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    n = 1 << 22
    zeros = bytes(n)
    want = zlib.crc32(a + zeros + b)
    crc_mid = crc32_combine(zlib.crc32(a), zlib.crc32(zeros), n)
    assert crc32_combine(crc_mid, zlib.crc32(b), 100) == want


def test_negative_length_rejected():
    with pytest.raises(ValueError):
        crc32_combine(0, 0, -1)
