"""Host codec round trips — the byte-compare oracle pattern from the
reference (compressor_func_test, unit_tests/test.cc:48-84)."""

import numpy as np
import pytest

from glz_tpu import compress, decompress
from glz_tpu import config as cfg
from glz_tpu.core import bitio
from glz_tpu.core.codebook import build_codebook, histogram_bytes
from glz_tpu.core.host_codec import decode_streams, encode_streams


@pytest.mark.parametrize("variant", ["table", "fast", "bitwalk"])
def test_stream_roundtrip_all_variants(text_100kb, variant):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    words, total_bits, stream_bits = encode_streams(arr, cb, stream_symbols=4096)
    assert int(stream_bits.sum()) == total_bits
    out = decode_streams(words, stream_bits, arr.size, 4096, cb, variant=variant)
    assert np.array_equal(out, arr)


def test_roundtrip_binary(binary_100kb):
    blob = compress(binary_100kb)
    assert decompress(blob) == binary_100kb


def test_roundtrip_text(text_100kb):
    blob = compress(text_100kb)
    assert decompress(blob) == text_100kb
    # Huffman on text should actually compress
    assert len(blob) < len(text_100kb)


@pytest.mark.parametrize("payload", [b"", b"a", b"ab", b"aaaa", bytes(range(256)), b"\x00" * 1000])
def test_edge_cases(payload):
    blob = compress(payload)
    assert decompress(blob) == payload


def test_many_small_streams(text_100kb):
    conf = cfg.GlzConfig(stream_symbols=512)
    blob = compress(text_100kb, conf=conf)
    assert decompress(blob) == text_100kb


def test_stream_boundaries_are_bit_exact(text_100kb):
    """Stream k+1 must start exactly at sum(stream_bits[:k+1]) — no padding
    between streams (the size-parity requirement)."""
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    words, total_bits, stream_bits = encode_streams(arr, cb, stream_symbols=1000)
    lens = cb.lengths[arr].astype(np.int64)
    per_stream = [lens[i * 1000 : (i + 1) * 1000].sum() for i in range(len(stream_bits))]
    assert np.array_equal(np.asarray(per_stream), stream_bits.astype(np.int64))


def test_compressed_size_close_to_entropy(text_1mb):
    arr = np.frombuffer(text_1mb, dtype=np.uint8)
    freqs = histogram_bytes(arr)
    p = freqs[freqs > 0] / freqs.sum()
    entropy_bits = float(-(p * np.log2(p)).sum() * arr.size)
    blob = compress(text_1mb)
    # Huffman overhead above entropy is bounded (< 1 bit/symbol); container
    # overhead must be tiny
    assert len(blob) * 8 < entropy_bits + arr.size + 16_000


def test_pack_extract_inverse(rng):
    lens = rng.integers(1, 33, size=1000)
    codes = np.array([rng.integers(0, 1 << int(l)) for l in lens], dtype=np.uint64)
    words, total = bitio.pack_codes_msb(codes, lens.astype(np.uint64))
    offs = np.cumsum(lens) - lens
    got = bitio.extract_bits(words, offs)
    exp = (codes << (64 - lens).astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
    # extract returns left-justified 32 bits; compare the top `len` bits
    for g, e, l in zip(got, exp, lens):
        shift = np.uint32(32 - l)
        assert (int(g) >> shift) == (int(e) >> shift)


def test_words_bytes_roundtrip(rng):
    words = rng.integers(0, 1 << 32, size=64, dtype=np.uint64).astype(np.uint32)
    total_bits = 64 * 32 - 5
    b = bitio.words_to_bytes(words, total_bits)
    back = bitio.bytes_to_words(b)
    # all full words except the last 32-bit word's final 5 bits (padded with 1s)
    assert np.array_equal(back[:-1], words[:-1])
    assert (int(back[-1]) >> 5) == ((int(words[-1]) | 0x1F) >> 5)


def test_batch_api_multi_file(rng):
    """Silesia-style multi-file batch (BASELINE config 4 shape)."""
    from glz_tpu import compress_batch, decompress_batch
    files = []
    for kind in range(4):
        p = rng.dirichlet(np.ones(256) * (0.05 + kind))
        files.append(rng.choice(256, size=20_000 + kind * 777, p=p).astype(np.uint8).tobytes())
    blobs = compress_batch(files)
    assert decompress_batch(blobs) == files
