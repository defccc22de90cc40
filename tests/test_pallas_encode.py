"""Pallas reverse-sweep encode kernel vs the host schedule oracle.

Runs the kernel in interpret mode on the CPU mesh and checks its payload is
word-identical to lockstep.reorder_payload_host (the contract the Pallas
decode kernel reads)."""

import numpy as np
import pytest

import jax.numpy as jnp

from glz_tpu.core import lockstep
from glz_tpu.core.codebook import build_codebook, histogram_bytes
from glz_tpu.ops import pallas_encode as pe

G = lockstep.GROUP_STREAMS


def _run_kernel(lens_mat, lj_mat, S, rows=lockstep.ROWS):
    """lens/lj: [L, S] host arrays (L a multiple of rows*128).  Returns
    (payload np.uint32 flat, padded group word counts)."""
    L = lens_mat.shape[0]
    lj = jnp.asarray(lj_mat.reshape(-1).astype(np.uint32))
    lens = jnp.asarray(lens_mat.reshape(-1).astype(np.uint32))
    payload, padded = pe.reorder_payload_pallas(lj, lens, S, interpret=True,
                                                rows=rows)
    return np.asarray(payload), padded


def _expected(lens_mat, codes_mat, S, G_=G):
    """Concatenated reorder_payload_host segments, 128-aligned per group."""
    segs, counts = [], []
    for g in range(lens_mat.shape[0] // G_):
        seg, n = lockstep.reorder_payload_host(
            lens_mat[g * G_ : (g + 1) * G_], codes_mat[g * G_ : (g + 1) * G_])
        pad = (-int(n)) % lockstep.LANES
        segs.append(np.concatenate([seg, np.zeros(pad, np.uint32)]))
        counts.append(int(n) + pad)
    return np.concatenate(segs), np.asarray(counts, np.int64)


def _random_case(rng, S, n_groups, max_len=16, ragged=True, G_=G):
    L = n_groups * G_
    lens = rng.integers(1, max_len + 1, size=(L, S)).astype(np.int64)
    counts = rng.integers(0, S + 1, size=L) if ragged else np.full(L, S)
    if ragged:
        counts[: G_ // 4] = 0
        counts[-1] = S  # at least one full lane
    lens = np.where(np.arange(S)[None, :] < counts[:, None], lens, 0)
    codes = np.zeros((L, S), dtype=np.uint64)
    nz = lens > 0
    codes[nz] = rng.integers(0, 1 << 63, size=int(nz.sum())).astype(np.uint64) & (
        (np.uint64(1) << lens[nz].astype(np.uint64)) - np.uint64(1))
    lj = np.where(nz, (codes << (32 - lens).astype(np.uint64)) & np.uint64(0xFFFFFFFF),
                  0).astype(np.uint32)
    return lens, codes, lj


@pytest.mark.parametrize("S,n_groups,ragged", [(16, 1, False), (24, 2, True)])
def test_kernel_matches_host_schedule(S, n_groups, ragged):
    rng = np.random.default_rng(S * 1000 + n_groups)
    lens, codes, lj = _random_case(rng, S, n_groups, ragged=ragged)
    payload, padded = _run_kernel(lens, lj, S)
    exp, exp_counts = _expected(lens, codes, S)
    assert np.array_equal(padded, exp_counts)
    assert np.array_equal(payload[: exp.size], exp)


@pytest.mark.parametrize("rows", [16, 32])
def test_kernel_wide_groups_match_host_schedule(rows):
    """Wide group geometry (rows*128 lanes — the r4 answer to the measured
    ~220-cycle/step decode floor): the reverse sweep must still reproduce
    the host consumption-order schedule exactly."""
    G_ = rows * lockstep.LANES
    rng = np.random.default_rng(rows)
    S = 16
    lens, codes, lj = _random_case(rng, S, 2, max_len=14, ragged=True, G_=G_)
    payload, padded = _run_kernel(lens, lj, S, rows=rows)
    exp, exp_counts = _expected(lens, codes, S, G_=G_)
    assert np.array_equal(padded, exp_counts)
    assert np.array_equal(payload[: exp.size], exp)


def test_kernel_chunked_steps():
    """S spanning multiple grid chunks (T_CH < S) exercises the cross-chunk
    register/cursor persistence."""
    rng = np.random.default_rng(7)
    S = 512  # pick_chunk -> 256, two chunks
    assert pe.pick_chunk(S) < S
    lens, codes, lj = _random_case(rng, S, 1, max_len=12, ragged=True)
    payload, padded = _run_kernel(lens, lj, S)
    exp, exp_counts = _expected(lens, codes, S)
    assert np.array_equal(padded, exp_counts)
    assert np.array_equal(payload[: exp.size], exp)


def test_kernel_real_codebook_roundtrip(text_100kb):
    """Kernel payload decodes byte-exactly via the host lockstep decoder."""
    S = 96
    n = G * S  # one group exactly
    data = (text_100kb * 2)[:n]
    arr = np.frombuffer(data, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    lens = cb.lengths[arr].astype(np.int64).reshape(G, S)
    lj = cb.left_justified_codes()[arr].astype(np.uint32).reshape(G, S)
    payload, padded = _run_kernel(lens, lj, S)
    out = lockstep.decode_group_host(
        payload, padded[0], np.full(G, S, np.int64), S,
        cb.first_code_left_justified(), cb.decode_offsets(),
        cb.symbols.astype(np.uint32), cb.min_len, cb.max_len)
    assert np.array_equal(out.T.reshape(-1), arr)


def test_encode_groups_gpi_matches_gpi1():
    """gpi=2 (two groups per kernel instance) must produce exactly the
    gpi=1 payload."""
    rng = np.random.default_rng(77)
    S = 32
    lens, codes, lj = _random_case(rng, S, 4, max_len=14)
    entry, ctot, gw = pe.prepare_entry(
        jnp.asarray(lj.reshape(-1)), jnp.asarray(lens.reshape(-1).astype(np.uint32)), S)
    gw_np = np.asarray(gw).astype(np.int64)
    padded = -(-gw_np // lockstep.LANES) * lockstep.LANES
    grow = (np.cumsum(padded) - padded) // lockstep.LANES
    mgw_rows = max(int(-(-gw_np.max() // lockstep.LANES)), 1)
    p_rows = int(grow[-1]) + mgw_rows
    args = (entry, ctot, jnp.asarray(gw_np.astype(np.int32)),
            jnp.asarray(grow.astype(np.int32)))
    base = np.asarray(pe.encode_groups(
        *args, S, S, mgw_rows, p_rows, gpi=1, interpret=True))
    for gpi in (2, 4):
        got = np.asarray(pe.encode_groups(
            *args, S, S, mgw_rows, p_rows, gpi=gpi, interpret=True))
        assert np.array_equal(got, base), f"gpi={gpi} mismatch"


def test_byte_lut_path_matches_entry_path(rng):
    """r5 shipping encode (in-kernel byte LUT + lane_totals pass) must
    produce byte-identical payloads to the materialized-entry path, and the
    batched emission must match per-substep emission."""
    import jax.numpy as jnp

    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_encode as pe

    S, rows = 64, 8
    group = rows * 128 * S
    n = group + 12345  # ragged second group
    padn = 2 * group
    arr = rng.choice(256, size=padn,
                     p=rng.dirichlet(np.ones(256) * 0.05)).astype(np.uint8)
    cb = build_codebook(np.bincount(arr[:n], minlength=256).astype(np.int64),
                        26)
    ent = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    outs = {}
    for probe in ("", "nobytelut", "noebatch", "nobytelut,noebatch"):
        payload, gw = pe.encode_payload_from_symbols(
            jnp.asarray(arr), jnp.int32(n), ent, S, interpret=True,
            rows=rows, probe=probe)
        outs[probe] = (np.asarray(payload), np.asarray(gw))
    base = outs[""]
    for probe, (p, g) in outs.items():
        assert np.array_equal(g, base[1]), probe
        assert np.array_equal(p, base[0]), probe


def test_lane_totals_oracle(rng):
    """lane_totals == the per-lane bit sums prepare_entry_fused computes."""
    import jax.numpy as jnp

    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_encode as pe

    S, rows = 64, 8
    n = rows * 128 * S + 999
    padn = 2 * rows * 128 * S
    arr = rng.choice(256, size=padn,
                     p=rng.dirichlet(np.ones(256) * 0.3)).astype(np.uint8)
    cb = build_codebook(np.bincount(arr[:n], minlength=256).astype(np.int64),
                        26)
    ent = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    _, ctot_ref, gw_ref = pe.prepare_entry_fused(
        jnp.asarray(arr), jnp.int32(n), ent, S, interpret=True, rows=rows)
    sym_t = pe.bytes_stepmajor(jnp.asarray(arr), S, rows)
    ctot, gw = pe.lane_totals(sym_t, ent, jnp.int32(n), S,
                              pe.pick_chunk(S, rows), interpret=True,
                              rows=rows)
    assert np.array_equal(np.asarray(ctot), np.asarray(ctot_ref))
    assert np.array_equal(np.asarray(gw), np.asarray(gw_ref))


def test_speculative_geometry_paths(rng):
    """r5 speculative kernel geometry: the histogram-derived bound path and
    the forced-fallback path (estimate too small -> exact re-run) must both
    produce the exact path's payload bytes."""
    import jax.numpy as jnp

    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_encode as pe

    S, rows = 512, 8
    group = rows * 128 * S
    n = group + 3333
    arr = rng.integers(0, 256, 2 * group, dtype=np.uint8)  # 8-bit codes
    freqs = np.bincount(arr[:n], minlength=256).astype(np.int64)
    cb = build_codebook(freqs, 26)
    ent = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    spec = pe.estimate_group_rows(freqs, cb.lengths, S, rows)
    assert spec > 1024  # uniform bytes: ~1024 real rows/group + margin
    outs = {}
    for tag, sp in (("exact", 0), ("spec", spec), ("fallback", 1)):
        p, g = pe.encode_payload_from_symbols(
            jnp.asarray(arr), jnp.int32(n), ent, S, interpret=True,
            rows=rows, spec_rows=sp)
        outs[tag] = (np.asarray(p), np.asarray(g))
    base_p, base_g = outs["exact"]
    total = int((-(-base_g // 128) * 128).sum())
    for tag, (p, g) in outs.items():
        assert np.array_equal(g, base_g), tag
        assert np.array_equal(p[:total], base_p[:total]), tag


def test_estimate_group_rows_bounds():
    from glz_tpu.ops import pallas_encode as pe

    freqs = np.full(256, 1000, np.int64)
    lens = np.full(256, 8, np.int32)
    est = pe.estimate_group_rows(freqs, lens, 512, 8)
    # 512K symbols * 8 bits / 32 / 128 = 1024 rows + lane words + margin
    assert 1024 < est < 1400
    assert pe.estimate_group_rows(np.zeros(256, np.int64), lens, 512, 8) == 0
    # too deep for the VMEM staging budget -> speculation disabled
    assert pe.estimate_group_rows(freqs, np.full(256, 26, np.int32),
                                  512, 64) == 0
