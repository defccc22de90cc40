"""Device (XLA) op tests on the CPU backend — encode/decode/histogram match
the host oracle bit-for-bit."""

import numpy as np
import jax.numpy as jnp
import pytest

from glz_tpu import config as cfg
from glz_tpu.core import bitio
from glz_tpu.core.codebook import build_codebook, histogram_bytes
from glz_tpu.core.host_codec import encode_streams
from glz_tpu.models.canonical_byte import compress_bytes_device, decompress_bytes_device
from glz_tpu.ops import decode as decode_ops
from glz_tpu.ops import encode as encode_ops
from glz_tpu.ops import histogram as hist_ops


def test_histogram_matches_numpy(binary_100kb):
    arr = np.frombuffer(binary_100kb, dtype=np.uint8)
    expect = histogram_bytes(arr)
    got = np.asarray(hist_ops.histogram_scatter(jnp.asarray(arr)))
    assert np.array_equal(got, expect)


def test_histogram_matmul_matches(binary_100kb):
    arr = np.frombuffer(binary_100kb, dtype=np.uint8)
    pad = (-arr.size) % (1 << 12)
    padded = np.concatenate([arr, np.zeros(pad, np.uint8)])
    got = np.asarray(hist_ops.histogram_matmul(jnp.asarray(padded), chunk=1 << 12)).astype(np.int64)
    got[0] -= pad
    assert np.array_equal(got, histogram_bytes(arr))


def test_encode_block_matches_host(text_100kb):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    S = 4096
    padded_n = -(-arr.size // S) * S
    chunk = np.concatenate([arr, np.zeros(padded_n - arr.size, np.uint8)])
    words, total_bits, stream_bits = encode_ops.encode_block(
        jnp.asarray(chunk), jnp.int32(arr.size),
        jnp.asarray(cb.codewords, dtype=jnp.uint32),
        jnp.asarray(cb.lengths, dtype=jnp.int32), S)
    h_words, h_total, h_bits = encode_streams(arr, cb, S)
    assert int(total_bits) == h_total
    n_words = (h_total + 31) >> 5
    assert np.array_equal(np.asarray(words[:n_words]), h_words[:n_words])
    assert np.array_equal(np.asarray(stream_bits)[: len(h_bits)], h_bits.astype(np.int64))


def test_decode_block_matches_input(text_100kb):
    arr = np.frombuffer(text_100kb, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    S = 2048
    words, total, sbits = encode_streams(arr, cb, S)
    starts = np.concatenate([[0], np.cumsum(sbits)[:-1]]).astype(np.uint32)
    lut, fc_lj, sp, syms = cb.decode_luts(12)
    out = decode_ops.decode_block(
        jnp.asarray(words), jnp.asarray(starts),
        jnp.asarray(lut, dtype=jnp.uint32), jnp.asarray(fc_lj, dtype=jnp.uint32),
        jnp.asarray(sp, dtype=jnp.uint32), jnp.asarray(syms, dtype=jnp.uint32),
        S, 12)
    flat = np.asarray(out).T.reshape(-1)[: arr.size]
    assert np.array_equal(flat, arr)


def test_decode_block_long_codes_slowpath():
    """Force codes longer than table_bits to exercise the cfind escape."""
    rng = np.random.default_rng(5)
    # exponential-ish distribution: deep tree
    p = 2.0 ** -np.arange(1, 25, dtype=np.float64)
    p = np.concatenate([p, np.full(8, p[-1])])
    p /= p.sum()
    arr = rng.choice(p.size, size=20_000, p=p).astype(np.uint8)
    freqs = np.bincount(arr, minlength=256).astype(np.int64)
    cb = build_codebook(freqs)
    assert cb.max_len > 8, "test needs codes longer than the table"
    S = 512
    words, total, sbits = encode_streams(arr, cb, S)
    starts = np.concatenate([[0], np.cumsum(sbits)[:-1]]).astype(np.uint32)
    lut, fc_lj, sp, syms = cb.decode_luts(8)
    out = decode_ops.decode_block(
        jnp.asarray(words), jnp.asarray(starts),
        jnp.asarray(lut, dtype=jnp.uint32), jnp.asarray(fc_lj, dtype=jnp.uint32),
        jnp.asarray(sp, dtype=jnp.uint32), jnp.asarray(syms, dtype=jnp.uint32),
        S, 8)
    flat = np.asarray(out).T.reshape(-1)[: arr.size]
    assert np.array_equal(flat, arr)


def test_device_roundtrip(text_100kb):
    conf = cfg.GlzConfig(stream_symbols=4096)
    blob = compress_bytes_device(text_100kb, conf)
    assert decompress_bytes_device(blob) == text_100kb


def test_device_container_readable_by_host(text_100kb):
    from glz_tpu.core.api import decompress_bytes_host
    conf = cfg.GlzConfig(stream_symbols=4096)
    blob = compress_bytes_device(text_100kb, conf)
    assert decompress_bytes_host(blob) == text_100kb


def test_host_container_readable_by_device(text_100kb):
    from glz_tpu.core.api import compress_bytes_host
    conf = cfg.GlzConfig(stream_symbols=4096)
    blob = compress_bytes_host(text_100kb, conf)
    assert decompress_bytes_device(blob) == text_100kb


def test_device_multi_dispatch(monkeypatch, text_1mb):
    """Exercise the dispatch-chunking + word-alignment path."""
    import glz_tpu.models.canonical_byte as m
    monkeypatch.setattr(m, "MAX_DISPATCH_SYMBOLS", 1 << 17)
    conf = cfg.GlzConfig(stream_symbols=1 << 14)
    blob = m.compress_bytes_device(text_1mb, conf)
    assert m.decompress_bytes_device(blob) == text_1mb
    # chunked stream decode too
    assert m.decompress_bytes_device(blob, streams_per_dispatch=7) == text_1mb
