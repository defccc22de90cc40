"""Device-side payload reorder for layout-2 (lockstep) containers.

Turns per-lane code lengths + per-lane packed words into the decoder
consumption-order payload defined in glz_tpu/core/lockstep.py, using only
TPU-fast primitives (cumsum + scatter-add; measured >100 G elem/s on v5e —
the XLA gathers this replaces run at 84 M elem/s).

Pipeline per dispatch of L lanes x S symbols (L a multiple of 1024):
  1. masks: mask[l,t] = 1 iff lane l loads a word at step t (pure cumsum
     arithmetic on the length matrix);
  2. word index per load: j[l,t] = cumsum_t(mask) - 1;
  3. target position per load: step-major (then lane-major) exclusive
     prefix within each 1024-lane group, offset by the group's base;
  4. scatter positions into a [L, S] staging table keyed by (l, j);
  5. scatter per-lane words W[l, j] to payload[staging[l, j]].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from glz_tpu.core.lockstep import LANES, ROWS, GROUP_STREAMS


@functools.partial(jax.jit, static_argnames=("S",))
def refill_masks_device(lens_mat: jax.Array, S: int) -> jax.Array:
    """lens_mat: u32 [L, S] -> mask u32 [L, S] (lockstep.refill_masks)."""
    c = jnp.cumsum(lens_mat, axis=1, dtype=jnp.uint32)
    cm1 = jnp.concatenate([jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=1)
    wa = (cm1 + 31) // 32 + 1
    wa_prev = jnp.concatenate([jnp.zeros_like(wa[:, :1]), wa[:, :-1]], axis=1)
    mask = wa - wa_prev
    first = (lens_mat[:, :1] > 0).astype(jnp.uint32)
    return jnp.concatenate([first, mask[:, 1:]], axis=1)


@functools.partial(jax.jit, static_argnames=("S",))
def reorder_payload_device(
    lens_mat: jax.Array,    # u32 [L, S]
    lane_words: jax.Array,  # u32 [L, S] word s of lane l's own bit stream
    S: int,
):
    """Returns (payload u32 [L*S], group_counts i32 [L//1024], total_words i32).

    payload[:total_words] is the consumption-ordered stream; group g's
    segment occupies [group_starts[g], group_starts[g] + group_counts[g]).
    """
    L = lens_mat.shape[0]
    assert L % GROUP_STREAMS == 0
    n_groups = L // GROUP_STREAMS

    mask = refill_masks_device(lens_mat, S)
    # j[l,t] valid only where mask==1; at such t it equals cumsum-1
    j = jnp.where(mask > 0, jnp.cumsum(mask, axis=1, dtype=jnp.uint32) - 1, 0)

    # ---- step-major (then lane-major) exclusive prefix within each group
    m3 = mask.reshape(n_groups, GROUP_STREAMS, S)
    m3t = m3.transpose(0, 2, 1)                               # [g, t, lane]
    m_sm = m3t.reshape(n_groups, S * GROUP_STREAMS)
    within = jnp.cumsum(m_sm, axis=1, dtype=jnp.uint32) - m_sm  # exclusive
    group_counts = m_sm.sum(axis=1, dtype=jnp.uint32)
    group_starts = jnp.cumsum(group_counts) - group_counts
    pos_sm = (within + group_starts[:, None])                 # [g, t*lane]

    # TPU scatters are only fast when targets are sorted (coalesced HBM
    # writes); an unsorted permutation runs at DRAM random-write speed
    # (~45 ns/elem measured).  The lane-major -> step-major permutation is
    # therefore decomposed into sorted scatters + one dense transpose:
    #   stage_t[l, j[l,t]] = t      (lane-major iteration, sorted targets)
    #   vt[l, stage_t[l, jj]] = W[l, jj]            (sorted within lanes)
    #   v = transpose(vt)                            (dense, fast)
    #   payload[pos_sm[t, l]] = v[t, l]              (step-major, sorted)
    step_iota = jax.lax.broadcasted_iota(jnp.uint32, (L, S), 1)
    flat_idx = (jnp.arange(L, dtype=jnp.uint32)[:, None] * jnp.uint32(S) + j).reshape(-1)
    flat_idx = jnp.where(mask.reshape(-1) > 0, flat_idx, jnp.uint32(L * S))
    stage_t = jnp.zeros(L * S + 1, jnp.uint32).at[flat_idx.astype(jnp.int32)].add(
        step_iota.reshape(-1), mode="drop")[: L * S].reshape(L, S)

    loads_per_lane = mask.sum(axis=1, dtype=jnp.uint32)
    jj = jax.lax.broadcasted_iota(jnp.uint32, (L, S), 1)
    valid = jj < loads_per_lane[:, None]
    vt_idx = jnp.where(
        valid,
        jnp.arange(L, dtype=jnp.uint32)[:, None] * jnp.uint32(S) + stage_t,
        jnp.uint32(L * S)).reshape(-1)
    vt = jnp.zeros(L * S + 1, jnp.uint32).at[vt_idx.astype(jnp.int32)].add(
        lane_words.reshape(-1), mode="drop")[: L * S].reshape(L, S)

    v_sm = vt.reshape(n_groups, GROUP_STREAMS, S).transpose(0, 2, 1).reshape(-1)
    pay_idx = jnp.where(m_sm.reshape(-1) > 0, pos_sm.reshape(-1), jnp.uint32(L * S))
    payload = jnp.zeros(L * S + 1, jnp.uint32).at[pay_idx.astype(jnp.int32)].add(
        v_sm, mode="drop")[: L * S]
    total = group_counts.sum().astype(jnp.int32)
    return payload, group_counts.astype(jnp.int32), total


@functools.partial(jax.jit, static_argnames=("S",))
def lane_pack_words(lj: jax.Array, lens: jax.Array, S: int):
    """Pack codes into per-lane word-aligned streams.

    lj/lens: u32 [L*S] flat (lane-major: lane l owns [l*S, (l+1)*S)).
    Returns u32 [L, S]: word s of lane l's own MSB-first bit stream
    (zero-padded; phantom words stay zero).
    """
    n = lj.shape[0]
    L = n // S
    lens2 = lens.reshape(L, S)
    ends = jnp.cumsum(lens2, axis=1, dtype=jnp.uint32)
    offsets = (ends - lens2 + (jax.lax.broadcasted_iota(
        jnp.uint32, (L, S), 0) * jnp.uint32(32 * S))).reshape(-1)

    lensf = lens
    phase = offsets & jnp.uint32(31)
    lo_idx = (offsets >> jnp.uint32(5)).astype(jnp.int32)
    lo = lj >> phase
    hi = jnp.where(phase > 0, lj << ((jnp.uint32(32) - phase) & jnp.uint32(31)), jnp.uint32(0))
    lo = jnp.where(lensf > 0, lo, jnp.uint32(0))
    hi = jnp.where(lensf > 0, hi, jnp.uint32(0))
    words = jnp.zeros(n + 1, jnp.uint32)
    words = words.at[lo_idx].add(lo, mode="drop")
    words = words.at[lo_idx + 1].add(hi, mode="drop")
    return words[:n].reshape(L, S)
