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


def _lockstep_step(mesh, n_dev, S=64, seed=5):
    from glz_tpu.core.lockstep import GROUP_STREAMS
    from glz_tpu.ops import pallas_decode as pd

    group_syms = GROUP_STREAMS * S
    n = n_dev * group_syms
    data, cb = _setup(n, seed=seed)
    n_valid = n - 1234
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    payload, gw_all, out = pmesh.lockstep_codec_step(
        mesh, jnp.asarray(data), n_valid, entry_tbl,
        jnp.asarray(cb.first_code_left_justified()),
        jnp.asarray(cb.decode_offsets()), jnp.asarray(symtab),
        S, cb.min_len, cb.max_len)
    decoded = np.asarray(pd.unpack_symbols(out, S))[:n_valid]
    assert np.array_equal(decoded, data[:n_valid])
    return data, cb, gw_all, payload, n_valid, S


def test_lockstep_mesh_roundtrip(mesh8):
    """The flagship Pallas kernels under shard_map: groups sharded across 8
    devices, codebook replicated, per-group word counts all_gather'd."""
    data, cb, gw_all, payload, n_valid, S = _lockstep_step(mesh8, 8)
    assert np.asarray(gw_all).shape == (8,)
    assert int(np.asarray(gw_all).sum()) > 0


def test_lockstep_mesh_2d(mesh2d):
    _lockstep_step(mesh2d, 8, S=64, seed=6)


def test_lockstep_mesh_matches_single_device(mesh8):
    """gw table and compacted payload from the mesh equal the single-call
    kernel output on the same input."""
    from glz_tpu.core.lockstep import LANES
    from glz_tpu.ops import pallas_encode as pe

    data, cb, gw_all, payload, n_valid, S = _lockstep_step(mesh8, 8, seed=7)
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    single_pay, padded = pe.encode_payload_from_symbols(
        jnp.asarray(data), jnp.int32(n_valid), entry_tbl, S, interpret=True)
    gw = np.asarray(gw_all).astype(np.int64)
    # compact each group's real words out of the fixed-stride mesh payload
    pay2 = np.asarray(payload).reshape(-1)
    stride = pay2.size // gw.size
    mesh_words = np.concatenate(
        [pay2[g * stride : g * stride + gw[g]] for g in range(gw.size)])
    starts = np.cumsum(padded) - padded
    sp = np.asarray(single_pay)
    single_words = np.concatenate(
        [sp[starts[g] : starts[g] + gw[g]] for g in range(gw.size)])
    assert np.array_equal(mesh_words, single_words)


def test_multihost_single_process_path():
    from glz_tpu.parallel import multihost
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=10_000, dtype=np.uint8).tobytes()
    blob = multihost.compress_bytes_multihost(data)
    from glz_tpu import decompress
    assert decompress(blob) == data


def test_lockstep_codec_step_stride_bound(mesh8, rng):
    """max_bits_per_symbol shrinks the per-group payload stride (r3 weak
    #7: the max_len worst case is 3-5x the real payload); a sufficient
    bound round-trips, an absurdly tight one raises."""
    import jax.numpy as jnp
    import pytest

    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.parallel import mesh as pmesh

    S = 64
    n = 8 * 1024 * S
    data = rng.integers(0, 64, size=n, dtype=np.uint8)
    hist = np.bincount(data, minlength=256).astype(np.int64)
    cb = build_codebook(hist, 26)
    entry_tbl = jnp.asarray(cb.left_justified_codes()
                            | cb.lengths.astype(np.uint32))
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    args = (mesh8, jnp.asarray(data), n, entry_tbl,
            jnp.asarray(cb.first_code_left_justified()),
            jnp.asarray(cb.decode_offsets()), jnp.asarray(symtab),
            S, cb.min_len, cb.max_len)
    _, _, out = pmesh.lockstep_codec_step(*args, max_bits_per_symbol=12)
    assert np.array_equal(np.asarray(pd.unpack_symbols(out, S))[:n], data)
    with pytest.raises(ValueError, match="too tight"):
        pmesh.lockstep_codec_step(*args, max_bits_per_symbol=1)
