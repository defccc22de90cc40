"""Pallas lockstep decode kernel (layout-2 payload).

Decodes ROWS*128 = 1024 streams per group in lockstep, one symbol per
stream per iteration.  All reference decoders are bit/byte-serial over one
stream (canonical_huff_encoder.cc:377-568); this kernel is the TPU-native
replacement: the only per-lane "memory accesses" are in-vreg lane gathers,
everything else is VPU arithmetic.

Key ideas (see glz_tpu/core/lockstep.py for the schedule contract):
  * payload words arrive in decoder consumption order, one segment per
    group -> payload reads are ONE scalar-offset (9,128) window slice per
    step, no gathers;
  * code length via branch-free canonical scan:
        len = min_len + sum_l [v < fc_lj[l]]
    (reference cfind, cc:437-456, vectorized); fc scalars are hoisted out
    of the step loop; offset[len] = start_pos[len] - first_code[len]
    accumulates through the same compare chain (a select per live length
    over hoisted off scalars — the row-gather variant measured 15% slower,
    PERFORMANCE.md r3);
  * symbol via 2-row in-vreg gather from the 256-entry bucket-sorted symbol
    table (reference symbol_[...] indexing, cc:456);
  * refill ranks via a group-wide exclusive prefix sum computed on the MXU
    (triangular-ones matmuls in bf16 — 0/1 inputs accumulate exactly in
    f32 — far cheaper than a roll tree);
  * the per-step dependency chain (rank -> k -> cursor -> window slice ->
    gather -> window -> scan) is serial, so one group leaves the VPU
    mostly idle waiting on latency.  `gpi` groups are decoded per kernel
    instance with fully independent register state; their chains
    interleave and hide each other's latency.

The 32-bit window may contain garbage bits beyond a stream's real payload
(phantom words, or a word loaded early); canonical first-code comparisons
depend only on the true code's top bits, so decode is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glz_tpu.core.lockstep import GROUP_STREAMS, LANES, ROWS

MAX_CODE_LEN = 32
OUT_PACK = 4


def _row_gather(win, idx, n_rows):
    """win: (n_rows, 128) u32; idx: (rows, 128) in [0, n_rows*128)."""
    col = idx & 127
    out = jnp.zeros(idx.shape, jnp.uint32)
    for r in range(n_rows):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(win[r : r + 1, :], idx.shape), col, axis=1)
        out = jnp.where((idx >> 7) == r, cand, out)
    return out


def _rank_mxu(need_u, triu, tril_r):
    """Group-wide exclusive prefix rank of needing lanes via MXU matmuls
    (inclusive in-row prefix with an upper-triangular ones matrix +
    cross-row carry with a strictly-lower-triangular (rows,rows) one).

    Returns (rank, inrow, carry): rank = inrow + carry, inrow the in-row
    exclusive prefix in [0, 128), carry the per-row base (rows,1) i32."""
    needf = need_u.astype(jnp.int32).astype(triu.dtype)
    inc = jnp.dot(needf, triu, preferred_element_type=jnp.float32)
    row_tot = jnp.sum(needf.astype(jnp.float32), axis=1, keepdims=True)
    carry_rows = jnp.dot(tril_r, row_tot, preferred_element_type=jnp.float32)
    inrow = (inc - needf.astype(jnp.float32)).astype(jnp.int32)
    carry = carry_rows.astype(jnp.int32)
    return inrow + carry, inrow, carry


REFILL_BND = 16  # wide-path short-chain candidate rows (see _window_gather)


def _window_gather(win, idx, carry, b0, wide_variant: str = "chain",
                   k=None, bnd: int = 0):
    """new_words[r,c] = win[idx[r,c] >> 7, idx[r,c] & 127] for the refill
    window.  Exploits idx = b0 + carry[r] + inrow[r,c] with inrow in
    [0,128): the source row of every element of output row r is rowsel[r] =
    (b0 + carry[r]) >> 7 or rowsel[r] + 1, so resolving the window takes
    one row-select per candidate row + one lane gather each.

    The row-select is a sublane-dimension move with a dynamic per-row
    index.  For rows <= 8 (source fits one 32-bit vreg along sublanes) it
    lowers to tpu.dynamic_gather; wider groups hit Mosaic's "multiple
    source vregs along gather dimension" limit, so the wide path uses a
    broadcast+select chain over the candidate window rows.

    r5: the chain is BOUNDED.  This step consumes k words, so every
    rowsel is <= (b0 + k) >> 7 — at real entropy (~4.4 bits/symbol) that
    is ~10 of the 65 candidate rows at rows=64.  When the caller passes k
    (the word count it already computes for the cursor), a lax.cond takes
    a bnd-row chain whenever b0 + k < bnd*128 and the full chain on the
    rare dense step — the r5 at-scale probe sweep measured the full chain
    as the decode kernel's single largest op (26% of runtime).

    win: (rows+1, 128) u32; idx: (rows, 128) i32 < (rows+1)*128;
    carry: (rows, 1) i32; b0: scalar i32; k: traced word count or None.
    """
    rows = idx.shape[0]
    win_rows = win.shape[0]
    rowsel = jnp.minimum((b0 + carry) >> 7, jnp.int32(win_rows - 2))
    rowsel_b = jnp.broadcast_to(rowsel, idx.shape)
    if rows <= 8:
        lo = jnp.take_along_axis(win[0:rows, :], rowsel_b, axis=0)
        hi = jnp.take_along_axis(win[1 : 1 + rows, :], rowsel_b, axis=0)
    elif k is not None and 0 < bnd < win_rows - 1:
        rs_short = jnp.minimum(rowsel_b, jnp.int32(bnd - 1))
        lo, hi = jax.lax.cond(
            b0 + k < bnd * LANES,
            lambda: _wide_row_select(win[: bnd + 1], rs_short, wide_variant),
            lambda: _wide_row_select(win, rowsel_b, wide_variant))
    else:
        lo, hi = _wide_row_select(win, rowsel_b, wide_variant)
    col = idx & 127
    a = jnp.take_along_axis(lo, col, axis=1)
    b = jnp.take_along_axis(hi, col, axis=1)
    return jnp.where((idx >> 7) > rowsel_b, b, a)


def _wide_row_select(win, rowsel_b, variant: str = "chain"):
    """(lo, hi) with lo[r,:] = win[rowsel[r],:], hi[r,:] = win[rowsel[r]+1,:]
    for rows > 8, where a sublane tpu.dynamic_gather cannot lower (single
    source vreg along the gather dimension).

    variant="chain": one broadcast of each candidate window row + two
    selects — pure VPU, no gathers.  variant="mm": one-hot
    (2*rows, win_rows) MXU select against the window's u16 halves (exact in
    f32) — kept for experiments; MISCOMPARES on real v5e hardware today
    (Mosaic small-K matmul with non-native operand shapes), see
    PERFORMANCE.md r4."""
    rows, lanes = rowsel_b.shape
    win_rows = win.shape[0]
    if variant == "mm":
        wiota = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, win_rows), 1)
        rsel2 = jnp.concatenate([rowsel_b[:, :1], rowsel_b[:, :1] + 1], axis=0)
        sel = (wiota == rsel2).astype(jnp.float32)
        wl = (win & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        wh = (win >> 16).astype(jnp.int32).astype(jnp.float32)
        gl = jnp.dot(sel, wl, preferred_element_type=jnp.float32)
        gh = jnp.dot(sel, wh, preferred_element_type=jnp.float32)
        g = (gl.astype(jnp.int32).astype(jnp.uint32)
             | (gh.astype(jnp.int32).astype(jnp.uint32) << 16))
        return g[:rows], g[rows:]
    lo = jnp.zeros((rows, lanes), jnp.uint32)
    hi = jnp.zeros((rows, lanes), jnp.uint32)
    for w in range(win_rows):
        rv = jnp.broadcast_to(win[w : w + 1, :], (rows, lanes))
        if w < win_rows - 1:
            lo = jnp.where(rowsel_b == w, rv, lo)
        if w >= 1:
            hi = jnp.where(rowsel_b == w - 1, rv, hi)
    return lo, hi


def _rank_hybrid(need_u, tril_r):
    """Exclusive flat rank via a 7-stage lane-roll prefix (VPU, parallel
    across rows) + the small (rows,rows) MXU matmul for the cross-row
    carry — probe alternative to the two-matmul _rank_mxu (its 128x128
    in-row prefix dot is latency-bound at ~130 cycles/step)."""
    rows = need_u.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    x = need_u.astype(jnp.int32)
    for st in range(7):
        d = 1 << st
        x = x + jnp.where(col >= d, pltpu.roll(x, d, axis=1), 0)
    inrow = x - need_u.astype(jnp.int32)          # exclusive in-row prefix
    row_tot = x[:, LANES - 1 :].astype(jnp.float32)
    carry = jnp.dot(tril_r, row_tot,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    return inrow + carry, inrow, carry


def _rank_roll(need_u):
    """Group-wide exclusive prefix rank via a Hillis–Steele shift tree on
    the VPU (no MXU): log2(G) stages of flat-order shifted adds."""
    rows = need_u.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    flat = row * LANES + col
    x = need_u.astype(jnp.int32)
    for st in range((rows * LANES).bit_length() - 1):
        d = 1 << st
        # shift right by d in flat order (zeros shifted in)
        dl, dr = d % LANES, d // LANES
        if dl:
            a = pltpu.roll(x, dl, axis=1)
            b = pltpu.roll(a, dr + 1, axis=0) if (dr + 1) % rows else a
            c2 = pltpu.roll(a, dr, axis=0) if dr % rows else a
            sh = jnp.where(col < dl, b, c2)
        else:
            sh = pltpu.roll(x, dr, axis=0)
        x = x + jnp.where(flat >= d, sh, 0)
    rank = x - need_u.astype(jnp.int32)  # exclusive
    carry = rank[:, 0:1]
    return rank, carry


def make_decode_kernel(S: int, min_len: int, max_len: int, w_rows: int,
                       gpi: int, bf16: bool = False, fastg: bool = True,
                       probe: str = "", rows: int = ROWS, unroll: int = 1):
    """Kernel factory, specialized on stream_symbols, the codebook's length
    range (the canonical scan unrolls to the live range), the VMEM payload
    window size, the number of groups decoded per instance, the group
    geometry (rows*128 streams per group; wider groups amortize the
    ~220-cycle/step control floor over more lanes), and the step-loop
    unroll (>1 decodes multiple symbols per lane per fori_loop iteration —
    the substeps stay serially dependent through the bit window, so this
    only pays down loop-control overhead)."""

    assert S % OUT_PACK == 0
    out_rows = S // OUT_PACK * rows
    win_rows = rows + 1  # covers base%128 + rank < 128 + rows*128

    def kernel(gs_ref,          # SMEM prefetch (n_groups,) i32 segment starts
               gc_ref,          # SMEM prefetch (n_groups,) i32 symbol counts
               gr_ref,          # SMEM prefetch (n_groups,) i32 base payload row
               payload_hbm,     # ANY (total_rows, 128) u32 full payload
               fc_ref,          # SMEM (MAX_CODE_LEN+2,) u32
               off_sm_ref,      # SMEM (MAX_CODE_LEN+2,) u32
               sym_ref,         # VMEM (2, 128) u32 symbol table
               out_ref,         # VMEM (gpi*out_rows, LANES) u32 packed symbols
               pay_ref,         # VMEM scratch (gpi*w_rows, 128) u32
               base_ref,        # SMEM scratch (gpi,) i32 cursors (group-rel)
               sems,            # DMA semaphores (gpi,)
               ):
        i = pl.program_id(0)
        dmas = []
        for s in range(gpi):
            g_row = gr_ref[i * gpi + s]
            dma = pltpu.make_async_copy(
                payload_hbm.at[pl.ds(g_row, w_rows), :],
                pay_ref.at[pl.ds(s * w_rows, w_rows), :],
                sems.at[s])
            dma.start()
            dmas.append(dma)
            base_ref[s] = gs_ref[i * gpi + s] - g_row * LANES

        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        row1 = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        lane_id = row1 * LANES + lane
        counts = [
            jnp.clip(gc_ref[i * gpi + s] - lane_id * S, 0, S)
            for s in range(gpi)
        ]

        # MXU helpers for the per-step rank: inclusive in-row prefix is a
        # matmul with an upper-triangular ones matrix; cross-row carry
        # comes from a (rows,rows) matmul on the row totals.
        triu = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                ).astype(jnp.bfloat16 if bf16 else jnp.float32)
        tril_r = (jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
                  > jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
                  ).astype(jnp.float32)  # [r, r'] = 1 iff r' < r

        # hoist codebook scalars out of the step loop
        fc_s = [fc_ref[l] for l in range(min_len, max_len)]
        off_s = [off_sm_ref[l] for l in range(min_len, max_len + 1)]

        for dma in dmas:
            dma.wait()

        def substep(t, carry, s):
            a, b, phase, qm, need_u, acc = carry
            need = need_u > 0
            count = counts[s]

            if "norank" in probe:        # diagnostic: no MXU rank matmuls
                rank = lane_id
                carry = lane_id[:, 0:1]
            elif "rollrank" in probe:
                rank, carry = _rank_roll(need_u)
            elif "hybridrank" in probe:
                rank, _, carry = _rank_hybrid(need_u, tril_r)
            else:
                rank, _, carry = _rank_mxu(need_u, triu, tril_r)

            # ---- refill: one (rows+1,128) window slice + in-vreg gather
            base = base_ref[s]
            if "statwin" in probe:       # diagnostic: static window slice
                win = pay_ref[s * w_rows : s * w_rows + win_rows, :]
            else:
                win = pay_ref[pl.ds(s * w_rows + base // LANES, win_rows), :]
            b0 = base % LANES
            idx = b0 + rank
            if "noksum" in probe:        # diagnostic: no scalar-sum chain
                k = None
            else:
                k = jnp.sum(need_u.astype(jnp.int32))
                if "norank" in probe:    # keep probe reads inside the window
                    k = jnp.minimum(k, 0)
            if "nogather" in probe:      # diagnostic: skip gathers, keep rank
                new_words = win[0:rows, :] ^ rank.astype(jnp.uint32)
            elif fastg:
                # probe "bndN" overrides the short-chain width (exp sweep)
                bnd = 0 if "nobnd" in probe else next(
                    (int(p[3:]) for p in probe.split(",")
                     if p.startswith("bnd") and p[3:].isdigit()), REFILL_BND)
                new_words = _window_gather(
                    win, idx, carry, b0,
                    wide_variant="mm" if "widemm" in probe else "chain",
                    k=k, bnd=bnd)
            else:
                new_words = _row_gather(win, idx, win_rows)
            if k is not None:
                base_ref[s] = base + k

            if "noab" in probe:          # diagnostic: no window/advance math
                v = new_words
            else:
                to_a = phase == 0
                a = jnp.where(need & to_a, new_words, a)
                b = jnp.where(need & jnp.logical_not(to_a), new_words, b)

                # ---- 32-bit window, left-justified
                v = jnp.where(
                    phase > 0,
                    (a << phase) | (b >> ((jnp.uint32(32) - phase) & jnp.uint32(31))),
                    a,
                )

            # ---- canonical length scan + fused offset accumulate
            ln = jnp.full((rows, LANES), min_len, jnp.uint32)
            off = jnp.full((rows, LANES), off_s[0], jnp.uint32)
            if "noscan" in probe:        # diagnostic: skip the length scan
                ln = ln + (v >> 31)
            else:
                for k2 in range(max_len - min_len):
                    cond = v < fc_s[k2]
                    ln = ln + cond.astype(jnp.uint32)
                    off = jnp.where(cond, off_s[k2 + 1], off)
            active = t < count
            ln = jnp.where(active, ln, jnp.uint32(0))

            # ---- symbol: bucket index then 2-row table gather
            g = (((v >> ((jnp.uint32(32) - ln) & jnp.uint32(31)))
                  + off) & jnp.uint32(255)).astype(jnp.int32)
            if "nosym" in probe:         # diagnostic: skip the symbol gather
                sym = g.astype(jnp.uint32)
            else:
                sym = _row_gather(sym_ref[:, :], g, 2)

            # ---- pack OUT_PACK symbols per u32 (little-endian by step)
            sub = t % OUT_PACK
            acc = acc | (sym << (jnp.uint32(8) * sub.astype(jnp.uint32)))

            if "nowhen" in probe:        # diagnostic: unconditional store
                out_ref[s * out_rows : s * out_rows + rows, :] = acc
            else:
                @pl.when(sub == OUT_PACK - 1)
                def _():
                    out_ref[pl.ds(s * out_rows + (t // OUT_PACK) * rows, rows), :] = acc

            acc = jnp.where(sub == OUT_PACK - 1, jnp.uint32(0), acc)

            if "noab" in probe:
                return new_words, b, phase, qm, need_u, acc

            # ---- advance
            crossed = (phase + ln) >= 32
            need2 = ((qm + ln) >= 32).astype(jnp.uint32)
            qm = (qm + ln) & jnp.uint32(31)
            a = jnp.where(crossed, b, a)
            phase = (phase + ln) & jnp.uint32(31)
            return a, b, phase, qm, need2, acc

        def step(t4, carries):
            out = carries
            for j in range(unroll):
                t = t4 * unroll + j if unroll > 1 else t4
                out = tuple(substep(t, out[s], s) for s in range(gpi))
            return out

        zero = jnp.zeros((rows, LANES), jnp.uint32)
        init = tuple(
            (zero, zero, zero, jnp.full((rows, LANES), 31, jnp.uint32),
             (counts[s] > 0).astype(jnp.uint32), zero)
            for s in range(gpi))
        jax.lax.fori_loop(0, S // unroll, step, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("S", "min_len", "max_len", "max_group_words", "gpi",
                     "bf16", "fastg", "probe", "interpret", "rows", "unroll"))
def decode_groups(
    payload: jax.Array,        # u32 [W_total] consumption-ordered, all groups
    group_starts: jax.Array,   # i32 [n_groups] absolute segment start (words)
    group_counts: jax.Array,   # i32 [n_groups] symbols in each group
    fc_lj: jax.Array,          # u32 [MAX_CODE_LEN+2]
    offsets: jax.Array,        # u32 [MAX_CODE_LEN+2]
    symtab: jax.Array,         # u32 [256]
    S: int,
    min_len: int,
    max_len: int,
    max_group_words: int,      # static, 128-aligned VMEM window size
    gpi: int = 1,              # groups decoded per kernel instance
    bf16: bool = False,
    fastg: bool = True,
    probe: str = "",           # diagnostic block knockouts (exp/ only)
    interpret: bool = False,
    rows: int = ROWS,          # group geometry: rows*128 streams per group
    unroll: int = 1,           # symbols per lane per fori_loop iteration
):
    """Decode all groups; returns u32 [n_groups, S//4*rows, 128] packed
    symbols (4 per word, little-endian by step; row-major (step4, row))."""
    if "unroll" in probe.split(","):  # legacy EXACT alias (r3 sweep logs);
        unroll = 4                    # substring match would eat unroll8/16
    assert S % max(unroll, 1) == 0
    n_groups = group_starts.shape[0]
    w_rows = max_group_words // LANES
    out_rows = S // OUT_PACK * rows
    kernel = make_decode_kernel(S, min_len, max_len, w_rows, gpi, bf16, fastg,
                                probe, rows, unroll)

    pad_g = (-n_groups) % gpi
    if pad_g:
        group_starts = jnp.concatenate(
            [group_starts, jnp.zeros(pad_g, group_starts.dtype)])
        group_counts = jnp.concatenate(
            [group_counts, jnp.zeros(pad_g, group_counts.dtype)])
    ng_pad = n_groups + pad_g

    group_base = (group_starts // LANES) * LANES
    group_rows = (group_base // LANES).astype(jnp.int32)

    w_pad = (-payload.shape[0]) % LANES
    payload2 = jnp.concatenate(
        [payload, jnp.zeros(w_pad + max_group_words, jnp.uint32)]).reshape(-1, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ng_pad // gpi,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # payload (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fc
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets
            pl.BlockSpec(memory_space=pltpu.VMEM),   # symtab (2,128)
        ],
        out_specs=pl.BlockSpec(
            (gpi * out_rows, LANES),
            lambda i, gs, gc, gr: (i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((gpi * w_rows, LANES), jnp.uint32),
            pltpu.SMEM((gpi,), jnp.int32),
            pltpu.SemaphoreType.DMA((gpi,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ng_pad * out_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(group_starts.astype(jnp.int32), group_counts.astype(jnp.int32),
      group_rows, payload2, fc_lj, offsets, symtab.reshape(2, LANES))
    return out.reshape(ng_pad, out_rows, LANES)[:n_groups]


def make_decode_kernel_dual(S: int, min0: int, max0: int,
                            min1: int, max1: int, w_rows: int,
                            pack2: bool, rows: int = ROWS):
    """HuffWord variant of the lockstep decode kernel: two canonical
    codebooks that alternate with step parity.

    With S even, the global parity of token (lane, t) = (lane*S + t) % 2 =
    t % 2 — uniform across the whole group — so the reference's per-token
    dictionary swap (canonical_huffword.h:615-640 `swap(now, other)`)
    becomes a static 2x unroll of the step loop: even substeps scan
    codebook 0's first-code/offset scalars, odd substeps codebook 1's.
    No per-lane select, no extra work vs the byte kernel.

    Output is the u32 canonical rank per token (index into the dictionary's
    bucket-sorted symbol table); vocabularies are too large for the in-vreg
    symbol gather, so rank -> token id is an XLA table take afterwards.
    With pack2 (both vocabularies < 64K, the common case) each substep
    pair packs (even | odd << 16) into one u32 — half the dynamic stores
    (they dominate this kernel's runtime) and half the output traffic.
    """
    assert S % 2 == 0

    def kernel(gs_ref,          # SMEM prefetch (n_groups,) i32 segment starts
               gc_ref,          # SMEM prefetch (n_groups,) i32 token counts
               gr_ref,          # SMEM prefetch (n_groups,) i32 base payload row
               payload_hbm,     # ANY (total_rows, 128) u32 full payload
               fc0_ref,         # SMEM (MAX_CODE_LEN+2,) u32 even-step codebook
               off0_ref,        # SMEM (MAX_CODE_LEN+2,) u32
               fc1_ref,         # SMEM (MAX_CODE_LEN+2,) u32 odd-step codebook
               off1_ref,        # SMEM (MAX_CODE_LEN+2,) u32
               out_ref,         # VMEM (S*ROWS, LANES) u32 ranks
                                #   (2D: 3D dynamic stores cost ~27us each)
               pay_ref,         # VMEM scratch (w_rows, 128) u32
               base_ref,        # SMEM scratch (1,) i32 cursor (group-relative)
               sem,             # DMA semaphore
               ):
        i = pl.program_id(0)
        g_row = gr_ref[i]
        dma = pltpu.make_async_copy(
            payload_hbm.at[pl.ds(g_row, w_rows), :], pay_ref, sem)
        dma.start()

        n_local = gc_ref[i]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        row1 = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        lane_id = row1 * LANES + lane
        count = jnp.clip(n_local - lane_id * S, 0, S)
        base_ref[0] = gs_ref[i] - g_row * LANES

        triu = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                ).astype(jnp.bfloat16)
        tril_r = (jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
                  > jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
                  ).astype(jnp.float32)

        fc_s = ([fc0_ref[l] for l in range(min0, max0)],
                [fc1_ref[l] for l in range(min1, max1)])
        off_s = ([off0_ref[l] for l in range(min0, max0 + 1)],
                 [off1_ref[l] for l in range(min1, max1 + 1)])
        mins = (min0, min1)
        maxs = (max0, max1)

        dma.wait()

        def substep(t, carry, p):
            a, b, phase, qm, need_u = carry
            need = need_u > 0

            rank, _, carry = _rank_mxu(need_u, triu, tril_r)

            base = base_ref[0]
            win = pay_ref[pl.ds(base // LANES, rows + 1), :]
            b0 = base % LANES
            idx = b0 + rank
            k = jnp.sum(need_u.astype(jnp.int32))
            new_words = _window_gather(win, idx, carry, b0, k=k,
                                       bnd=REFILL_BND)
            base_ref[0] = base + k

            to_a = phase == 0
            a = jnp.where(need & to_a, new_words, a)
            b = jnp.where(need & jnp.logical_not(to_a), new_words, b)

            v = jnp.where(
                phase > 0,
                (a << phase) | (b >> ((jnp.uint32(32) - phase) & jnp.uint32(31))),
                a,
            )

            ln = jnp.full((rows, LANES), mins[p], jnp.uint32)
            off = jnp.full((rows, LANES), off_s[p][0], jnp.uint32)
            for k2 in range(maxs[p] - mins[p]):
                cond = v < fc_s[p][k2]
                ln = ln + cond.astype(jnp.uint32)
                off = jnp.where(cond, off_s[p][k2 + 1], off)
            active = t < count
            ln = jnp.where(active, ln, jnp.uint32(0))

            g = (v >> ((jnp.uint32(32) - ln) & jnp.uint32(31))) + off
            g = jnp.where(active, g, jnp.uint32(0))

            crossed = (phase + ln) >= 32
            need2 = ((qm + ln) >= 32).astype(jnp.uint32)
            qm = (qm + ln) & jnp.uint32(31)
            a = jnp.where(crossed, b, a)
            phase = (phase + ln) & jnp.uint32(31)
            return (a, b, phase, qm, need2), g

        def step(k, carry):
            carry, g0 = substep(2 * k, carry, 0)
            carry, g1 = substep(2 * k + 1, carry, 1)
            if pack2:
                out_ref[pl.ds(k * rows, rows), :] = g0 | (g1 << 16)
            else:
                out_ref[pl.ds(2 * k * rows, rows), :] = g0
                out_ref[pl.ds((2 * k + 1) * rows, rows), :] = g1
            return carry

        zero = jnp.zeros((rows, LANES), jnp.uint32)
        init = (zero, zero, zero, jnp.full((rows, LANES), 31, jnp.uint32),
                (count > 0).astype(jnp.uint32))
        jax.lax.fori_loop(0, S // 2, step, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("S", "min0", "max0", "min1", "max1",
                     "max_group_words", "pack2", "interpret", "rows"))
def decode_groups_dual(
    payload: jax.Array,        # u32 [W_total] consumption-ordered, all groups
    group_starts: jax.Array,   # i32 [n_groups] absolute segment start (words)
    group_counts: jax.Array,   # i32 [n_groups] tokens in each group
    fc0: jax.Array,            # u32 [MAX_CODE_LEN+2] even-step codebook
    off0: jax.Array,
    fc1: jax.Array,            # u32 [MAX_CODE_LEN+2] odd-step codebook
    off1: jax.Array,
    S: int,
    min0: int, max0: int,
    min1: int, max1: int,
    max_group_words: int,
    pack2: bool = False,
    interpret: bool = False,
    rows: int = ROWS,
):
    """Decode all groups with alternating codebooks; returns u32 canonical
    ranks, [n_groups, S*rows, 128] row-major (step, row) — or, with pack2,
    [n_groups, S//2*rows, 128] with (even | odd << 16) per substep pair
    (use unpack_ranks_packed)."""
    n_groups = group_starts.shape[0]
    w_rows = max_group_words // LANES
    out_rows = (S // 2 if pack2 else S) * rows
    kernel = make_decode_kernel_dual(S, min0, max0, min1, max1, w_rows, pack2,
                                     rows)

    group_base = (group_starts // LANES) * LANES
    group_rows = (group_base // LANES).astype(jnp.int32)

    w_pad = (-payload.shape[0]) % LANES
    payload2 = jnp.concatenate(
        [payload, jnp.zeros(w_pad + max_group_words, jnp.uint32)]).reshape(-1, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # payload (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fc0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # off0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fc1
            pl.BlockSpec(memory_space=pltpu.SMEM),   # off1
        ],
        out_specs=pl.BlockSpec(
            (out_rows, LANES),
            lambda i, gs, gc, gr: (i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w_rows, LANES), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_groups * out_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(group_starts.astype(jnp.int32), group_counts.astype(jnp.int32),
      group_rows, payload2, fc0, off0, fc1, off1)
    return out.reshape(n_groups, out_rows, LANES)


def unpack_ranks(ranks: jax.Array, S: int, rows: int = ROWS) -> jax.Array:
    """[n_groups, S*rows, 128] u32 step-major ranks -> flat u32 ranks in
    token order (lane-major within group)."""
    n_groups = ranks.shape[0]
    r4 = ranks.reshape(n_groups, S, rows, LANES)
    return r4.transpose(0, 2, 3, 1).reshape(-1)


def unpack_ranks_packed(ranks: jax.Array, S: int, rows: int = ROWS) -> jax.Array:
    """pack2 variant: [n_groups, S//2*rows, 128] u32 (even | odd << 16)
    -> flat u32 ranks in token order (lane-major within group)."""
    n_groups = ranks.shape[0]
    r4 = ranks.reshape(n_groups, S // 2, rows, LANES)
    pair = jnp.stack([r4 & 0xFFFF, r4 >> 16], axis=2)  # [g, k, 2, r, l]
    return pair.transpose(0, 3, 4, 1, 2).reshape(-1)


def unpack_symbols(packed: jax.Array, S: int, rows: int = ROWS):
    """[n_groups, S//4*rows, 128] u32 -> flat u8 symbols in file order
    (lane-major within group); returns a host numpy array.

    The device does only the (step4, row, lane) -> (row, lane, step4)
    transpose: eager ops materialize every intermediate, and any layout
    with a trailing 4-wide axis tile-pads 32x in HBM (a 512 MiB output
    became a 64 GiB allocation).  The kernel packs the 4 symbols of each
    u32 little-endian by step, so the byte split is a free '<u4' ->
    uint8 view once the words are on the host — D2H moves the same n
    bytes either way."""
    import numpy as np

    n_groups = packed.shape[0]
    p4 = packed.reshape(n_groups, S // OUT_PACK, rows, LANES)
    t = jnp.transpose(p4, (0, 2, 3, 1))  # [g, rows, lanes, S//4], lanes-major
    host = np.ascontiguousarray(np.asarray(t))  # np.asarray may keep strides
    return host.astype("<u4", copy=False).view(np.uint8).reshape(-1)
