"""Native C++ host library vs the NumPy oracle."""

import numpy as np
import pytest

from glz_tpu.core import bitio
from glz_tpu.core.codebook import build_codebook, histogram_bytes
from glz_tpu.core.host_codec import encode_streams
from glz_tpu.utils import native, tokenizer


@pytest.fixture(scope="module")
def nat():
    if native.lib() is None:
        pytest.skip("native library unavailable (no g++?)")
    return native


def test_native_histogram(nat, binary_100kb):
    arr = np.frombuffer(binary_100kb, dtype=np.uint8)
    assert np.array_equal(nat.histogram(arr), histogram_bytes(arr))


def test_native_encode_matches_numpy(nat, text_100kb):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    S = 4096
    payload, total_bits, sbits = nat.encode_bytes(
        arr, cb.left_justified_codes(), cb.lengths, S)
    words, h_total, h_bits = encode_streams(arr, cb, S)
    assert total_bits == h_total
    assert np.array_equal(sbits.astype(np.int64), h_bits.astype(np.int64))
    assert payload == bitio.words_to_bytes(words, h_total)


def test_native_decode_roundtrip(nat, text_100kb):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    S = 2048
    payload, total_bits, sbits = nat.encode_bytes(
        arr, cb.left_justified_codes(), cb.lengths, S)
    lut, fc_lj, sp, syms = cb.decode_luts(12)
    out = nat.decode_streams(payload, sbits, arr.size, S, lut, 12, fc_lj, sp, syms)
    assert np.array_equal(out, arr)


def test_native_tokenize_matches_python(nat, text_100kb):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    bounds, first = nat.tokenize(arr)
    starts, lengths, word_first = tokenizer.tokenize(arr)
    assert first == word_first
    assert np.array_equal(bounds[:-1].astype(np.int64), starts)
    assert np.array_equal(np.diff(bounds.astype(np.int64)), lengths)


def test_host_api_uses_native(nat, text_1mb):
    from glz_tpu import compress, decompress
    blob = compress(text_1mb)
    assert decompress(blob) == text_1mb


def test_native_throughput(nat, text_1mb):
    """Sanity: native host codec well above python speeds (informational)."""
    import time
    arr = np.frombuffer(text_1mb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    t0 = time.perf_counter()
    payload, bits, sbits = nat.encode_bytes(arr, cb.left_justified_codes(), cb.lengths, 1 << 16)
    t_enc = time.perf_counter() - t0
    lut, fc_lj, sp, syms = cb.decode_luts(14)
    t0 = time.perf_counter()
    out = nat.decode_streams(payload, sbits, arr.size, 1 << 16, lut, 14, fc_lj, sp, syms)
    t_dec = time.perf_counter() - t0
    assert np.array_equal(out, arr)
    assert arr.size / t_enc > 50e6   # >50 MB/s encode
    assert arr.size / t_dec > 50e6   # >50 MB/s decode
