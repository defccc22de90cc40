"""Lockstep (layout-2) schedule: host reorder + host lockstep decoder
round-trip, the oracle pair for the Pallas decode kernel."""

import numpy as np
import pytest

from glz_tpu.core import lockstep
from glz_tpu.core.codebook import build_codebook, histogram_bytes


def _prep(data: bytes, S: int):
    arr = np.frombuffer(data, dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    n_lanes = lockstep.GROUP_STREAMS
    lens_flat = cb.lengths[arr].astype(np.int64)
    codes_flat = cb.codewords[arr].astype(np.uint64)
    lens_mat = lockstep.stream_lengths_matrix(lens_flat, n_lanes, S)
    codes_mat = np.zeros(n_lanes * S, dtype=np.uint64)
    codes_mat[: codes_flat.size] = codes_flat
    codes_mat = codes_mat.reshape(n_lanes, S)
    return arr, cb, lens_mat, codes_mat


def test_refill_mask_counts_match_words():
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 33, size=(lockstep.GROUP_STREAMS, 64))
    mask = lockstep.refill_masks(lens)
    c = lens.cumsum(axis=1)
    # total loads = floor((c(S-2)+31)/32)+1, never more than real words + 1
    loads = mask.sum(axis=1)
    expect = (c[:, -2] + 31) // 32 + 1
    assert np.array_equal(loads, expect)
    real_words = -(-c[:, -1] // 32)
    assert np.all(loads <= real_words + 1)
    assert np.all(mask.max(axis=None) <= 1)


def test_lockstep_roundtrip(text_100kb):
    S = 128
    n_lanes = lockstep.GROUP_STREAMS
    data = (text_100kb * 2)[: n_lanes * S]  # exactly one full group
    arr, cb, lens_mat, codes_mat = _prep(data, S)
    payload, word_count = lockstep.reorder_payload_host(lens_mat, codes_mat)
    fc_lj = cb.first_code_left_justified()
    offsets = cb.decode_offsets()
    lane_counts = np.full(n_lanes, S, dtype=np.int64)
    out = lockstep.decode_group_host(
        payload, word_count, lane_counts, S, fc_lj,
        offsets, cb.symbols.astype(np.uint32), cb.min_len, cb.max_len)
    flat = out.T.reshape(-1)[: arr.size]
    assert np.array_equal(flat, arr)


@pytest.mark.parametrize("case", ["random", "len32", "exact32", "ragged"])
def test_reverse_sweep_matches_forward(case):
    """reorder_payload_reverse_host (the Pallas encode spec) must be
    byte-identical to reorder_payload_host on every edge: empty lanes,
    lanes ending mid-row, exact multiples of 32 bits, 32-bit codes."""
    rng = np.random.default_rng(hash(case) & 0xFFFF)
    G, S = lockstep.GROUP_STREAMS, 24
    if case == "len32":
        lens = rng.integers(24, 33, size=(G, S)).astype(np.int64)
    elif case == "exact32":
        lens = np.full((G, S), 8, dtype=np.int64)  # c_total % 32 == 0
    else:
        lens = rng.integers(1, 17, size=(G, S)).astype(np.int64)
    # front-packed raggedness: random per-lane symbol counts incl. zero
    counts = rng.integers(0, S + 1, size=G)
    if case in ("ragged", "random"):
        counts[:64] = 0
    else:
        counts[:] = S
    step = np.arange(S)[None, :]
    lens = np.where(step < counts[:, None], lens, 0)
    codes = np.zeros((G, S), dtype=np.uint64)
    nz = lens > 0
    codes[nz] = rng.integers(0, 1 << 63, size=int(nz.sum())).astype(np.uint64) & (
        (np.uint64(1) << lens[nz].astype(np.uint64)) - np.uint64(1))
    fwd, n_fwd = lockstep.reorder_payload_host(lens, codes)
    lj = np.where(nz, (codes << (32 - lens).astype(np.uint64)) & np.uint64(0xFFFFFFFF), 0).astype(np.uint32)
    rev, n_rev = lockstep.reorder_payload_reverse_host(lens, lj)
    assert n_fwd == n_rev
    assert np.array_equal(fwd, rev)


def test_lockstep_roundtrip_ragged(text_100kb):
    """Partial last lanes: some lanes shorter, some empty."""
    S = 128
    n_lanes = lockstep.GROUP_STREAMS
    n = 90_000 - 57  # partial group: ~704 lanes, last one ragged, rest empty
    arr, cb, lens_mat, codes_mat = _prep(text_100kb[:n], S)
    payload, word_count = lockstep.reorder_payload_host(lens_mat, codes_mat)
    fc_lj = cb.first_code_left_justified()
    offsets = cb.decode_offsets()
    lane_counts = np.clip(n - np.arange(n_lanes) * S, 0, S)
    out = lockstep.decode_group_host(
        payload, word_count, lane_counts, S, fc_lj,
        offsets, cb.symbols.astype(np.uint32), cb.min_len, cb.max_len)
    flat = out.T.reshape(-1)[:n]
    assert np.array_equal(flat, arr)


def test_bounded_refill_dense_branch(rng):
    """r5 bounded refill chain: identical per-lane streams synchronize the
    word-boundary crossings, so single steps consume rows*128 words — far
    past the short-chain bound — and must take the full-chain cond branch
    bit-exactly (normal corpora stay under it)."""
    import jax.numpy as jnp

    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops import pallas_encode as pe

    S, rows = 64, 32
    group = rows * 128 * S
    lane = rng.choice(256, size=S,
                      p=rng.dirichlet(np.ones(256) * 0.2)).astype(np.uint8)
    arr = np.tile(lane, rows * 128)  # every lane identical
    n = arr.size
    assert n == group
    cb = build_codebook(np.bincount(arr, minlength=256).astype(np.int64), 26)
    ent = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    payload, gw = pe.encode_payload_from_symbols(
        jnp.asarray(arr), jnp.int32(n), ent, S, interpret=True, rows=rows)
    starts = np.cumsum(gw) - gw
    counts = np.clip(n - np.arange(gw.size) * group, 0, group)
    need = int(gw.max()) + rows * 128 + 256
    mgw = max(-(-need // (1 << 12)) * (1 << 12), 1 << 12)
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    out = pd.decode_groups(
        payload, jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(counts.astype(np.int32)),
        jnp.asarray(cb.first_code_left_justified()),
        jnp.asarray(cb.decode_offsets()), jnp.asarray(symtab),
        S, cb.min_len, cb.max_len, mgw, interpret=True, rows=rows)
    flat = np.asarray(pd.unpack_symbols(out, S, rows))[:n]
    assert np.array_equal(flat, arr)
