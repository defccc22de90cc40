"""Mesh/shard_map codec paths on the virtual 8-device CPU mesh
(BASELINE configs 4/5 simulated; SURVEY.md §4 distributed test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glz_tpu.core.codebook import build_codebook
from glz_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8, axis_names=("data", "stream"), shape=(4, 2))


def _setup(n, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 64, size=n, dtype=np.uint8)
    hist = np.bincount(data, minlength=256).astype(np.int64)
    cb = build_codebook(hist)
    return data, cb


def test_sharded_histogram(mesh8):
    data, _ = _setup(8 * 4096)
    got = np.asarray(pmesh.sharded_histogram(mesh8, jnp.asarray(data)))
    assert np.array_equal(got, np.bincount(data, minlength=256))


def test_sharded_codec_step_roundtrip(mesh8):
    S = 256
    n = 8 * 2 * S  # 2 streams per device
    data, cb = _setup(n, seed=1)
    luts = tuple(jnp.asarray(x.astype(np.uint32)) for x in cb.decode_luts(12))
    words, total_bits, stream_bits, out = pmesh.codec_step(
        mesh8, jnp.asarray(data), jnp.int32(n),
        jnp.asarray(cb.codewords, dtype=jnp.uint32),
        jnp.asarray(cb.lengths, dtype=jnp.int32),
        luts, stream_symbols=S, table_bits=12)
    flat = np.asarray(out)
    decoded = np.concatenate([flat[d].T.reshape(-1) for d in range(8)])
    assert np.array_equal(decoded, data)


def test_sharded_codec_step_2d_mesh(mesh2d):
    S = 128
    n = 8 * 2 * S
    data, cb = _setup(n, seed=2)
    luts = tuple(jnp.asarray(x.astype(np.uint32)) for x in cb.decode_luts(12))
    words, total_bits, stream_bits, out = pmesh.codec_step(
        mesh2d, jnp.asarray(data), jnp.int32(n),
        jnp.asarray(cb.codewords, dtype=jnp.uint32),
        jnp.asarray(cb.lengths, dtype=jnp.int32),
        luts, stream_symbols=S, table_bits=12)
    flat = np.asarray(out)
    decoded = np.concatenate([flat[d].T.reshape(-1) for d in range(8)])
    assert np.array_equal(decoded, data)


def test_sharded_encode_matches_single_device(mesh8):
    """Sharded encode produces the same per-stream bit table as host."""
    from glz_tpu.core.host_codec import encode_streams
    S = 512
    n = 8 * 2 * S
    data, cb = _setup(n, seed=3)
    words, total_bits, stream_bits = pmesh.sharded_encode(
        mesh8, jnp.asarray(data), jnp.int32(n),
        jnp.asarray(cb.codewords, dtype=jnp.uint32),
        jnp.asarray(cb.lengths, dtype=jnp.int32), S)
    _, h_total, h_bits = encode_streams(data, cb, S)
    got_bits = np.asarray(stream_bits).reshape(-1)
    assert np.array_equal(got_bits, h_bits.astype(np.int64))
    assert int(np.asarray(total_bits).sum()) == h_total


def test_multihost_single_process_path():
    from glz_tpu.parallel import multihost
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=10_000, dtype=np.uint8).tobytes()
    blob = multihost.compress_bytes_multihost(data)
    from glz_tpu import decompress
    assert decompress(blob) == data
