"""Pallas lockstep encode kernel (layout-2 payload) — the reverse sweep.

Builds the decoder-consumption-order payload (glz_tpu/core/lockstep.py is
the schedule contract; reorder_payload_reverse_host is the host oracle) in
ONE pass over the symbols with O(1) state per lane, replacing the XLA
scatter pipeline in exp/reorder.py (whose unsorted scatters run at DRAM
random-write speed) and, transitively, the reference's serial per-bit
accumulator (canonical_huff_encoder.cc:270-285, buffer.h:241-248).

Per group of ROWS x 128 = 1024 lanes the kernel iterates steps t = S-1..0:

  * prepend symbol t's left-justified code into a 64-bit window held as two
    u32 registers per lane (the window is [c(t), c(t)+64) of the lane's
    final bit stream, so every emitted word is fully known by emission
    time — see lockstep.reorder_payload_reverse_host for the proof);
  * lanes whose forward decode loads a word at step t+1 emit the 32-bit
    word at the next 32-boundary of their window;
  * emitted words are compacted group-wide in lane order and OR'd into a
    VMEM staging buffer at a DESCENDING cursor, so the finished segment is
    exactly the forward consumption order.

The compaction is the TPU-shaped part: each emitting lane must move left by
delta = lane_id - rank(lane) slots.  delta is nondecreasing in lane id
(it counts non-emitting lanes before this one), so a 10-stage butterfly —
stage s rotates the whole 1024-slot group left by 2^s and moves elements
whose delta has bit s set — is collision-free and order-preserving:
for kept i < j, (delta_j & m) - (delta_i & m) <= delta_j - delta_i
< j - i for every low-bit mask m, so partial positions stay strictly
ordered at every stage.  All data movement is lane/sublane rotations — the
one permutation primitive the VPU does at register speed.

Group segments start 128-word-aligned in the output payload (the <=127
pad words per ~MB-scale group cost <0.01% ratio); each finished group is
DMA'd VMEM -> HBM at its own row offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glz_tpu.core.lockstep import GROUP_STREAMS, LANES, ROWS

LEN_BITS = 6          # entry word = lj | len; needs max_len <= 32 - LEN_BITS
LEN_MASK = (1 << LEN_BITS) - 1
MAX_FUSED_LEN = 32 - LEN_BITS


def _rotl_flat(x, d: int):
    """Rotate the (rows, LANES) block left by static d in flat order:
    y[i] = x[(i + d) % (rows*LANES)], i = row*LANES + col."""
    rows = x.shape[0]
    dl, dr = d % LANES, d // LANES
    if dl == 0:
        return pltpu.roll(x, (rows - dr) % rows, axis=0) if dr % rows else x
    a = pltpu.roll(x, LANES - dl, axis=1)          # a[r,c] = x[r,(c+dl)%128]
    b = pltpu.roll(a, (rows - dr) % rows, axis=0) if dr % rows else a
    c2 = pltpu.roll(a, (rows - dr - 1) % rows, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(col < LANES - dl, b, c2)


def pick_unroll(T_CH: int) -> int:
    # 8 measured ~2.5% faster than 4 on v5e but roughly doubles the Mosaic
    # compile time of the unrolled body — not worth it (r3 tuning)
    for u in (4, 2):
        if T_CH % u == 0:
            return u
    return 1


def _pick_unroll_probe(T_CH: int, probe: str) -> int:
    """Probe overrides for the emission batch width (exp A/B: wider
    batches traverse the serial emit chain less often)."""
    for u in (16, 8):
        if f"unroll{u}" in probe and T_CH % u == 0:
            return u
    return pick_unroll(T_CH)


def _lut2(tbl, idx):
    """tbl (2, LANES) u32, idx i32 in [0, 256) -> tbl.reshape(-1)[idx].
    The in-vreg 256-entry lookup (pallas_lut.py's trick, inlined)."""
    col = idx & 127
    lo = jnp.take_along_axis(jnp.broadcast_to(tbl[0:1, :], idx.shape), col,
                             axis=1)
    hi = jnp.take_along_axis(jnp.broadcast_to(tbl[1:2, :], idx.shape), col,
                             axis=1)
    return jnp.where((idx >> 7) > 0, hi, lo)


def make_encode_kernel(T_CH: int, n_chunks: int, mgw_rows: int, gpi: int,
                       rows: int = ROWS, probe: str = "",
                       byte_lut: bool = False):
    """Kernel factory.  Grid (n_groups // gpi, n_chunks); chunk ch processes
    global steps [(n_chunks-1-ch)*T_CH, ...+T_CH) in descending order for
    `gpi` groups with independent register state (their serial emit chains
    interleave and hide each other's latency — same scheme as the decode
    kernel's gpi).

    The step loop is branch-free (the one special case — no emission at the
    very first processed step t = S-1 — is a masked select, not a branch)
    and unrolled 4x with a single entry slice per body, so Mosaic can
    software-pipeline across steps.

    Emission is BATCHED over the unrolled substeps (r5): the r5 probe
    sweep measured the per-substep emit chain (MXU rank -> butterfly ->
    cursor -> staging OR-store, serialized through the SMEM cursor) at 63%
    of kernel runtime (noemit 25.3 ms vs 67.7 ms at 512 MiB).  The four
    substeps' (need, word) pairs are collected and compacted in ONE
    4x-taller rank/butterfly/store — the candidate order (ascending step,
    then lane) IS the forward consumption order, and the butterfly's
    order-preservation proof only needs delta nondecreasing in flat
    order, which holds for any mask.  One serial chain traversal per 4
    symbols instead of per symbol."""
    UNROLL = _pick_unroll_probe(T_CH, probe)
    G = rows * LANES
    ebatch = "noebatch" not in probe  # old per-substep emission (exp A/B)
    batch_rows = (UNROLL if ebatch else 1) * rows
    stage_rows = mgw_rows + batch_rows + 1

    S = T_CH * n_chunks

    def kernel(gw_ref,       # SMEM prefetch (n_groups,) i32 real words/group
               grow_ref,     # SMEM prefetch (n_groups,) i32 aligned start row
               nv_ref,       # SMEM prefetch (1,) i32 valid symbol count
               *rest):
        if byte_lut:
            # entry_ref holds step-major BYTES; the lj|len entry is looked
            # up in-kernel from tbl_ref (4x less HBM read than u32 entries)
            (entry_ref,      # VMEM (gpi, T_CH*rows, 128) u8 step-major bytes
             ctot_ref,       # VMEM (gpi, rows, 128) i32 per-lane total bits
             tbl_ref,        # VMEM (2, 128) u32 fused lj|len entry table
             out_hbm,        # ANY (p_rows, 128) u32 full payload
             pay_ref, w0_ref, w1_ref, cur_ref, cursor_ref, sems,
             entsc_ref) = rest  # VMEM (gpi*T_CH*rows, 128) u32 chunk entries
        else:
            (entry_ref,      # VMEM (gpi, T_CH*rows, 128) u32: step-major
             ctot_ref,       # VMEM (gpi, rows, 128) i32 per-lane total bits
             out_hbm,        # ANY (p_rows, 128) u32 full payload
             pay_ref,        # VMEM scratch (gpi*stage_rows, 128) u32 staging
             w0_ref,         # VMEM scratch (gpi*rows, 128) u32
             w1_ref,         # VMEM scratch (gpi*rows, 128) u32
             cur_ref,        # VMEM scratch (gpi*rows, 128) i32
             cursor_ref,     # SMEM scratch (gpi,) i32 descending cursors
             sems) = rest    # DMA semaphores (gpi,)
        g = pl.program_id(0)
        ch = pl.program_id(1)

        if byte_lut:
            # block-level LUT: convert the whole chunk's bytes to masked
            # lj|len entries ONCE into VMEM scratch (one wide vector pass
            # instead of a per-substep gather in the serial step loop)
            nv = nv_ref[0]
            CR = T_CH * rows
            brow = jax.lax.broadcasted_iota(jnp.int32, (CR, LANES), 0)
            bcol = jax.lax.broadcasted_iota(jnp.int32, (CR, LANES), 1)
            t_loc = brow // rows
            rr = brow % rows
            for s in range(gpi):
                ent_u32 = _lut2(tbl_ref, entry_ref[s].astype(jnp.int32))
                orig = (((g * gpi + s) * G + rr * LANES + bcol) * S
                        + (n_chunks - 1 - ch) * T_CH + t_loc)
                entsc_ref[pl.ds(s * CR, CR), :] = jnp.where(
                    orig < nv, ent_u32, jnp.uint32(0))

        def entry_block(s, lo, n_rows):
            """Rows [lo, lo+n_rows) of slot s's entry chunk (u32)."""
            if byte_lut:
                return entsc_ref[pl.ds(s * T_CH * rows + lo, n_rows), :]
            return entry_ref[s, pl.ds(lo, n_rows), :]

        # MXU rank helper (same scheme as the decode kernel); bf16 inputs
        # are 0/1 and accumulate exactly in f32.  The row-carry triangle is
        # built per emission shape inside emit().
        triu = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                ).astype(jnp.bfloat16)

        @pl.when(ch == 0)
        def _():
            pay_ref[:] = jnp.zeros((gpi * stage_rows, LANES), jnp.uint32)
            w0_ref[:] = jnp.zeros((gpi * rows, LANES), jnp.uint32)
            w1_ref[:] = jnp.zeros((gpi * rows, LANES), jnp.uint32)
            for s in range(gpi):
                cur_ref[pl.ds(s * rows, rows), :] = ctot_ref[s]
                cursor_ref[s] = gw_ref[g * gpi + s]

        def emit(s, need_u, word):
            """Compact `word` over slots with need_u==1 (flat order) and OR
            the run into slot s's staging rows at its descending cursor.
            Shape-generic: need_u/word are (br, LANES) for any br (one
            substep's rows, or UNROLL*rows for a batched emission)."""
            if "noemit" in probe:        # diagnostic: loop + prepend only
                return
            br = need_u.shape[0]
            B = br * LANES
            bcol = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
            brow = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
            flat_id = brow * LANES + bcol
            if "norank" in probe:        # diagnostic: no MXU rank matmuls
                rank = flat_id
            else:
                needf = need_u.astype(jnp.int32).astype(jnp.float32)
                inc = jnp.dot(needf.astype(jnp.bfloat16), triu,
                              preferred_element_type=jnp.float32)
                row_tot = jnp.sum(needf, axis=1, keepdims=True)
                tril_b = (jax.lax.broadcasted_iota(jnp.int32, (br, br), 0)
                          > jax.lax.broadcasted_iota(jnp.int32, (br, br), 1)
                          ).astype(jnp.float32)
                carry = jnp.dot(tril_b, row_tot,
                                preferred_element_type=jnp.float32)
                rank = (inc - needf + carry).astype(jnp.int32)
            k = jnp.sum(need_u.astype(jnp.int32))

            # aux = delta for emitting slots, 0 otherwise.  aux == 0 covers
            # both "empty slot" and "element already in place": neither
            # moves nor vacates, and empty slots hold val == 0, so no
            # explicit validity bit is needed in the butterfly.
            delta = (flat_id - rank).astype(jnp.uint32)
            aux = jnp.where(need_u > 0, delta, jnp.uint32(0))
            val = jnp.where(need_u > 0, word, jnp.uint32(0))
            if "nobfly" not in probe:    # diagnostic: skip the compaction
                for st in range(B.bit_length() - 1):
                    cv = _rotl_flat(val, 1 << st)
                    ca = _rotl_flat(aux, 1 << st)
                    move_in = (ca >> st) & 1
                    leaving = (aux >> st) & 1
                    val = jnp.where(move_in > 0, cv,
                                    jnp.where(leaving > 0, jnp.uint32(0), val))
                    aux = jnp.where(move_in > 0, ca,
                                    jnp.where(leaving > 0, jnp.uint32(0), aux))

            # floor at 0: exact on every correct run (the cursor ends at
            # exactly 0), and keeps a speculative-geometry estimate MISS
            # (clamped gw < real emissions, see _launch) writing bounded
            # garbage inside the staging slot instead of at negative
            # offsets — a hardware-verified TPU fault otherwise
            cursor_new = jnp.maximum(cursor_ref[s] - k, 0)
            rot = jax.lax.rem(cursor_new, LANES)
            row0 = s * stage_rows + jax.lax.div(cursor_new, LANES)
            if "nostore" not in probe:   # diagnostic: skip the OR stores
                # place val (flat-rank order) at flat window offset rot
                a = pltpu.roll(val, rot, axis=1)    # a[r,c] = val[r,(c-rot)%128]
                b = pltpu.roll(a, 1, axis=0)        # b[r,c] = a[r-1,c]
                main = jnp.where(bcol >= rot, a, b)
                mask_main = (flat_id >= rot) & (flat_id < rot + k)
                main = jnp.where(mask_main, main, jnp.uint32(0))
                win = pay_ref[pl.ds(row0, br), :]
                pay_ref[pl.ds(row0, br), :] = win | main
                # wrapped tail: flat positions [B, B+rot) live in row `br`
                extra = jnp.where(bcol[0:1, :] < rot + k - B,
                                  a[br - 1 : br, :], jnp.uint32(0))
                win_tail = pay_ref[pl.ds(row0 + br, 1), :]
                pay_ref[pl.ds(row0 + br, 1), :] = win_tail | extra
            cursor_ref[s] = cursor_new

        def substep(s, w0, w1, cur, ent, skip_emit):
            """One reverse-sweep symbol: returns the new window state plus
            this substep's (need, word) emission candidates (the caller
            either emits them immediately or batches them)."""
            ln = (ent & jnp.uint32(LEN_MASK)).astype(jnp.int32)
            lj = ent & jnp.uint32(0xFFFFFFFF ^ LEN_MASK)
            cur_prev = cur - ln

            # ---- the word forward step t+1 loads (masked at t == S-1)
            need = (((cur + 31) >> 5) > ((cur_prev + 31) >> 5)).astype(jnp.uint32)
            need = jnp.where(skip_emit, jnp.uint32(0), need)
            d = (jnp.uint32(32) - (cur.astype(jnp.uint32) & jnp.uint32(31))) & jnp.uint32(31)
            word = jnp.where(
                d > 0,
                (w0 << d) | (w1 >> ((jnp.uint32(32) - d) & jnp.uint32(31))),
                w0)

            if "noprepend" in probe:     # diagnostic: skip the window shift
                return (w0 ^ lj, w1, cur_prev), need, word

            # ---- prepend symbol t's code (shift window right by ln)
            lnu = ln.astype(jnp.uint32)
            nz = lnu > 0
            sl = (jnp.uint32(32) - lnu) & jnp.uint32(31)
            big = lnu >= 32            # uint32 >> 32 is undefined; select it out
            lnc = lnu & jnp.uint32(31)
            rs1 = jnp.where(big, jnp.uint32(0), w1 >> lnc)
            rs0 = jnp.where(big, jnp.uint32(0), w0 >> lnc)
            w1n = jnp.where(nz, (w0 << sl) | rs1, w1)
            w0n = jnp.where(nz, lj | rs0, w0)
            return (w0n, w1n, cur_prev), need, word

        def step(kk, carryv):
            base = T_CH - (kk + 1) * UNROLL
            ents = [entry_block(s, base * rows, UNROLL * rows)
                    for s in range(gpi)]
            out = list(carryv)
            needs = [[] for _ in range(gpi)]
            words = [[] for _ in range(gpi)]
            for j in range(UNROLL - 1, -1, -1):
                t_local = base + j
                skip = jnp.logical_and(ch == 0, t_local == T_CH - 1)
                # interleave the slots per substep so their serial chains
                # overlap
                for s in range(gpi):
                    w0, w1, cur = out[s]
                    ent = ents[s][j * rows : (j + 1) * rows, :]
                    out[s], need, word = substep(s, w0, w1, cur, ent, skip)
                    if ebatch:
                        needs[s].append(need)
                        words[s].append(word)
                    else:
                        emit(s, need, word)
            if ebatch:
                # batched emission: candidates ordered ascending step then
                # lane == the forward consumption order (substeps were
                # processed at DESCENDING t, so reverse the lists)
                for s in range(gpi):
                    emit(s, jnp.concatenate(needs[s][::-1], axis=0),
                         jnp.concatenate(words[s][::-1], axis=0))
            return tuple(out)

        init = tuple(
            (w0_ref[s * rows : (s + 1) * rows, :],
             w1_ref[s * rows : (s + 1) * rows, :],
             cur_ref[s * rows : (s + 1) * rows, :])
            for s in range(gpi))
        fin = jax.lax.fori_loop(0, T_CH // UNROLL, step, init)
        for s in range(gpi):
            w0_ref[s * rows : (s + 1) * rows, :] = fin[s][0]
            w1_ref[s * rows : (s + 1) * rows, :] = fin[s][1]
            cur_ref[s * rows : (s + 1) * rows, :] = fin[s][2]

        @pl.when(ch == n_chunks - 1)
        def _():
            # forward step 0 loads word 0 for every lane with a step-0 symbol
            for s in range(gpi):
                ln0 = entry_block(s, 0, rows) & jnp.uint32(LEN_MASK)
                emit(s, (ln0 > 0).astype(jnp.uint32), fin[s][0])
                cp = pltpu.make_async_copy(
                    pay_ref.at[pl.ds(s * stage_rows, mgw_rows), :],
                    out_hbm.at[pl.ds(grow_ref[g * gpi + s], mgw_rows), :],
                    sems.at[s])
                cp.start()
                # Slot DMAs must complete in slot order when gpi > 1: each
                # writes mgw_rows rows whose zero tail can overlap the next
                # slot's payload region (grow spacing is padded[g]/128 <=
                # mgw_rows), so concurrent slot DMAs would race on hardware.
                if gpi > 1:
                    cp.wait()
            if gpi == 1:
                cp.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("S", "T_CH", "mgw_rows", "p_rows", "gpi", "interpret",
                     "rows", "probe"))
def encode_groups(
    entry: jax.Array,        # [n_groups, S*rows, 128] step-major: u32 lj|len
                             # entries, or u8 BYTES when entry_tbl is given
    ctot: jax.Array,         # i32 [n_groups, rows, 128] per-lane total bits
    group_words: jax.Array,  # i32 [n_groups] real payload words per group
    group_rows: jax.Array,   # i32 [n_groups] aligned output start rows
    S: int,
    T_CH: int,
    mgw_rows: int,           # static, rows DMA'd per group (>= max real rows)
    p_rows: int,             # static, output rows = last start + mgw_rows
    gpi: int = 1,            # groups encoded per kernel instance
    interpret: bool = False,
    rows: int = ROWS,        # group geometry: rows*128 lanes per group
    probe: str = "",         # diagnostic block knockouts (exp/ only)
    entry_tbl: jax.Array | None = None,  # u32 [256]: byte-LUT mode (r5)
    n_valid: jax.Array | None = None,    # i32 scalar, required with entry_tbl
):
    """Run the reverse-sweep encode kernel over all groups.

    With entry_tbl set, `entry` holds step-major BYTES and the fused lj|len
    entry is resolved in-kernel (in-vreg 2-row gather) with an in-kernel
    validity mask against n_valid — 4x less HBM read than materialized u32
    entries, and no 2 GiB entry intermediate at all (r5 encode-floor fix).

    Returns u32 [p_rows, 128]: group g's consumption-ordered segment is
    rows [group_rows[g], ...), words [0, group_words[g]) of it real, the
    128-alignment tail zero."""
    n_groups = entry.shape[0]
    assert S % T_CH == 0 and n_groups % gpi == 0
    byte_lut = entry_tbl is not None
    n_chunks = S // T_CH
    kernel = make_encode_kernel(T_CH, n_chunks, mgw_rows, gpi, rows, probe,
                                byte_lut)
    # staging buffer must cover the batched-emission window (see the
    # stage_rows computation in make_encode_kernel)
    batch_rows = (_pick_unroll_probe(T_CH, probe)
                  if "noebatch" not in probe else 1) * rows
    stage_rows = mgw_rows + batch_rows + 1

    in_specs = [
        pl.BlockSpec(
            (gpi, T_CH * rows, LANES),
            lambda g, ch, gw, gr, nv: (g, n_chunks - 1 - ch, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (gpi, rows, LANES),
            lambda g, ch, gw, gr, nv: (g, 0, 0),
            memory_space=pltpu.VMEM),
    ]
    operands = [entry, ctot]
    if byte_lut:
        in_specs.append(pl.BlockSpec(
            (2, LANES), lambda g, ch, gw, gr, nv: (0, 0),
            memory_space=pltpu.VMEM))
        operands.append(entry_tbl.reshape(2, LANES))
        nv_arr = jnp.asarray(n_valid, jnp.int32).reshape(1)
    else:
        nv_arr = jnp.zeros(1, jnp.int32)

    scratch_shapes = [
        pltpu.VMEM((gpi * stage_rows, LANES), jnp.uint32),
        pltpu.VMEM((gpi * rows, LANES), jnp.uint32),
        pltpu.VMEM((gpi * rows, LANES), jnp.uint32),
        pltpu.VMEM((gpi * rows, LANES), jnp.int32),
        pltpu.SMEM((gpi,), jnp.int32),
        pltpu.SemaphoreType.DMA((gpi,)),
    ]
    if byte_lut:
        # chunk-level entry scratch for the in-kernel block LUT
        scratch_shapes.append(
            pltpu.VMEM((gpi * T_CH * rows, LANES), jnp.uint32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups // gpi, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(group_words.astype(jnp.int32), group_rows.astype(jnp.int32), nv_arr,
      *operands)


def make_totals_kernel(T_CH: int, n_chunks: int, rows: int):
    """Per-lane bit totals + refill word counts from step-major bytes.

    The r5 replacement for prepare_entry_fused's whole-file entry
    materialization: reads 1 byte/symbol, writes 4 bytes/LANE (not per
    symbol), so the encode pipeline's HBM traffic drops from ~6.5 GiB to
    ~1.5 GiB per 512 MiB input."""
    S = T_CH * n_chunks
    G = rows * LANES
    UNROLL = pick_unroll(T_CH)

    def kernel(nv_ref,        # SMEM prefetch (1,) i32 valid symbol count
               bytes_ref,     # VMEM (1, T_CH*rows, LANES) u8 step-major
               tbl_ref,       # VMEM (2, LANES) u32 fused lj|len entries
               ctot_ref,      # VMEM out (1, rows, LANES) i32 total bits
               w_ref,         # VMEM out (1, rows, LANES) i32 refill words
               ):
        g = pl.program_id(0)
        ch = pl.program_id(1)
        nv = nv_ref[0]
        lane_id = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
                   * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))

        def lens_at(tl):
            b = bytes_ref[0, pl.ds(tl * rows, rows), :].astype(jnp.int32)
            ln = (_lut2(tbl_ref, b) & jnp.uint32(LEN_MASK)).astype(jnp.int32)
            orig = (g * G + lane_id) * S + ch * T_CH + tl
            return jnp.where(orig < nv, ln, 0)

        @pl.when(ch == 0)
        def _():
            ctot_ref[0] = jnp.zeros((rows, LANES), jnp.int32)

        def body(kk, acc):
            for j in range(UNROLL):
                acc = acc + lens_at(kk * UNROLL + j)
            return acc

        acc = jax.lax.fori_loop(0, T_CH // UNROLL, body, ctot_ref[0])
        ctot_ref[0] = acc

        @pl.when(ch == n_chunks - 1)
        def _():
            last = lens_at(T_CH - 1)
            w_ref[0] = jnp.where(acc > 0, (acc - last + 31) // 32 + 1, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("S", "T_CH", "interpret", "rows"))
def lane_totals(sym_t: jax.Array, entry_tbl: jax.Array, n_valid,
                S: int, T_CH: int, interpret: bool = False,
                rows: int = ROWS):
    """Step-major bytes [n_groups, S*rows, 128] u8 -> (ctot i32
    [n_groups, rows, 128], group_words i32 [n_groups])."""
    n_groups = sym_t.shape[0]
    n_chunks = S // T_CH
    kernel = make_totals_kernel(T_CH, n_chunks, rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, T_CH * rows, LANES),
                         lambda g, ch, nv: (g, ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda g, ch, nv: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda g, ch, nv: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda g, ch, nv: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    ctot, w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_groups, rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_groups, rows, LANES), jnp.int32)),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1),
      sym_t, entry_tbl.reshape(2, LANES))
    return ctot, w.sum(axis=(1, 2), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("S", "rows"))
def bytes_stepmajor(sym: jax.Array, S: int, rows: int = ROWS) -> jax.Array:
    """u8 symbols (group-padded) -> step-major [n_groups, S*rows, 128]."""
    G = rows * LANES
    n_groups = sym.shape[0] // (G * S)
    return (sym.reshape(n_groups, rows, LANES, S)
            .transpose(0, 3, 1, 2).reshape(n_groups, S * rows, LANES))


def pick_chunk(S: int, rows: int = ROWS) -> int:
    """Largest power-of-2-ish divisor of S that keeps the entry chunk
    (T_CH * rows * 512 B, double-buffered) comfortably in VMEM — the same
    ~1 MiB budget regardless of group width."""
    cap = max(64, 2048 // rows)
    t = S
    while t > cap and t % 2 == 0:
        t //= 2
    return t


@functools.partial(jax.jit, static_argnames=("S", "interpret", "rows"))
def prepare_entry_fused(sym: jax.Array, n_valid: jax.Array,
                        entry_tbl: jax.Array, S: int,
                        interpret: bool = False, rows: int = ROWS):
    """u8 symbols -> (entry, ctot, group_words) with one LUT pass.

    Transposes the BYTES to step-major first (4x less transpose traffic
    than transposing the u32 entries), then runs the Pallas 256-LUT on the
    permuted stream; validity masking maps each permuted position back to
    its original flat index.  entry_tbl[b] = lj[b] | len[b] (max_len <= 26).
    """
    from glz_tpu.ops.pallas_lut import lut256

    G = rows * LANES
    n = sym.shape[0]
    n_groups = n // (G * S)
    sym_t = sym.reshape(n_groups, rows, LANES, S).transpose(0, 3, 1, 2)
    ent = lut256(sym_t.reshape(-1), entry_tbl, interpret=interpret)
    ent = ent.reshape(n_groups, S, rows, LANES)
    g_i = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 0)
    t_i = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 1)
    r_i = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 2)
    c_i = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 3)
    orig = (g_i * G + r_i * LANES + c_i) * S + t_i
    ent = jnp.where(orig < n_valid, ent, jnp.uint32(0))
    lens = (ent & jnp.uint32(LEN_MASK)).astype(jnp.int32)
    ctot = lens.sum(axis=1)
    last = lens[:, S - 1]
    w = jnp.where(ctot > 0, (ctot - last + 31) // 32 + 1, 0)
    return (ent.reshape(n_groups, S * rows, LANES), ctot,
            w.sum(axis=(1, 2), dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("S", "rows"))
def prepare_entry_words(ent_flat: jax.Array, S: int, rows: int = ROWS):
    """Flat lane-major fused lj|len entry words -> (entry, ctot, group_words).

    entry: u32 [n_groups, S*rows, 128] step-major fused lj|len words;
    ctot:  i32 [n_groups, rows, 128] per-lane total bits;
    group_words: i32 [n_groups] real payload words per group
    (= sum over lanes of the refill-schedule word count,
    (c_total - last_len + 31)//32 + 1 for nonempty lanes).

    The entry values are symbol-type agnostic: byte mode builds them with
    the Pallas 256-LUT, HuffWord gathers them per token id on the host —
    the reverse-sweep kernel only ever sees lj|len words."""
    G = rows * LANES
    n = ent_flat.shape[0]
    L = n // S
    n_groups = L // G
    ent = ent_flat.reshape(n_groups, rows, LANES, S)
    entry = ent.transpose(0, 3, 1, 2).reshape(n_groups, S * rows, LANES)
    lens4 = (ent & jnp.uint32(LEN_MASK)).astype(jnp.int32)
    ctot = lens4.sum(axis=3)
    last = lens4[:, :, :, S - 1]
    w = jnp.where(ctot > 0, (ctot - last + 31) // 32 + 1, 0)
    return entry, ctot, w.sum(axis=(1, 2), dtype=jnp.int32)


def prepare_entry(lj: jax.Array, lens: jax.Array, S: int, rows: int = ROWS):
    """Flat lane-major (lj, lens) -> (entry, ctot, group_words)."""
    return prepare_entry_words(lj | lens, S, rows)


def _launch(entry, ctot, gw, S: int, interpret: bool,
            min_mgw_rows: int = 0, min_p_rows: int = 0, rows: int = ROWS,
            probe: str = "", entry_tbl=None, n_valid=None,
            spec_rows: int = 0):
    """Host-side glue: group geometry from the device word counts, then the
    reverse-sweep kernel.  Returns (payload u32 device [rows*128], padded
    per-group word counts np.int64).

    mgw_rows and p_rows are the kernel's only data-dependent static shapes;
    both are bucketed (and can be floored via min_*) so different inputs of
    the same size reuse one compiled kernel — a Mosaic compile costs
    minutes over the axon tunnel, the <=2 MiB of padding costs nothing.

    spec_rows > 0 enables SPECULATIVE geometry (r5): the caller supplies a
    histogram-derived upper bound on rows-per-group, the per-group output
    offsets are cumsum'd ON DEVICE, and the kernel is dispatched before
    gw ever reaches the host — the D2H sync (a full tunnel RTT on this
    environment) then overlaps kernel execution.  If any group exceeds the
    bound (non-stationary data), the speculative dispatch is discarded and
    the exact path re-runs — correctness never depends on the estimate."""
    import numpy as np

    n_groups = int(gw.shape[0])
    if spec_rows > 8192:   # staging buffer (spec rows x 512 B) must fit VMEM
        spec_rows = 0
    if spec_rows > 0:
        mgw_rows = max(-(-spec_rows // 512) * 512, 512, min_mgw_rows)
        p_rows = max(-(-(n_groups * mgw_rows) // 4096) * 4096, min_p_rows)
        # CLAMP the word counts fed to the speculative dispatch: on an
        # estimate miss the kernel still runs before the host check can
        # discard it, and unclamped counts would drive the staging stores
        # and output DMAs past the estimate-sized buffers (OOB into live
        # HBM).  On the success path (every gw <= mgw_rows*128) the clamp
        # is a no-op; on a miss the output is garbage but BOUNDED, and the
        # exact path below re-runs from untouched inputs.
        gw_c = jnp.minimum(gw.astype(jnp.int32), jnp.int32(mgw_rows * LANES))
        padded_rows = (gw_c + (LANES - 1)) // LANES
        grow_dev = jnp.cumsum(padded_rows) - padded_rows
        out = encode_groups(entry, ctot, gw_c, grow_dev.astype(jnp.int32),
                            S, pick_chunk(S, rows), mgw_rows, p_rows,
                            interpret=interpret, rows=rows, probe=probe,
                            entry_tbl=entry_tbl, n_valid=n_valid)
        gw_np = np.asarray(gw).astype(np.int64)  # overlaps the kernel
        if int(-(-gw_np.max() // LANES)) <= mgw_rows:
            padded = -(-gw_np // LANES) * LANES
            return out.reshape(-1), padded
        # estimate too small: fall through to the exact path (gw_np in hand)
        del out
    else:
        gw_np = np.asarray(gw).astype(np.int64)

    padded = -(-gw_np // LANES) * LANES
    grow = (np.cumsum(padded) - padded) // LANES
    mgw_rows = int(-(-gw_np.max() // LANES))
    # bucket to limit recompiles; +rows+1 rows headroom is inside the kernel
    mgw_rows = max(-(-mgw_rows // 512) * 512, 512, min_mgw_rows)
    p_rows = int(grow[-1]) + mgw_rows
    p_rows = max(-(-p_rows // 4096) * 4096, min_p_rows)
    out = encode_groups(entry, ctot, jnp.asarray(gw_np.astype(np.int32)),
                        jnp.asarray(grow.astype(np.int32)),
                        S, pick_chunk(S, rows), mgw_rows, p_rows,
                        interpret=interpret, rows=rows, probe=probe,
                        entry_tbl=entry_tbl, n_valid=n_valid)
    return out.reshape(-1), padded


def estimate_group_rows(freqs, lengths, S: int, rows: int = ROWS,
                        margin: float = 1.15) -> int:
    """Histogram-derived rows-per-group bound for speculative geometry
    (see _launch): expected payload words per group + one refill word per
    lane, with a stationarity margin.  Capped so the kernel's VMEM staging
    buffer stays within budget (0 disables speculation — e.g. avg code
    length so deep that the staging would not fit)."""
    import numpy as np

    freqs = np.asarray(freqs, np.float64)
    tot = freqs.sum()
    if tot <= 0:
        return 0
    avg_bits = float((freqs * np.asarray(lengths, np.float64)).sum() / tot)
    group_syms = rows * LANES * S
    words = group_syms * avg_bits / 32 + rows * LANES
    est = int(words * margin / LANES) + 2
    return est if est <= 8192 else 0  # staging (est rows x 512 B) <= 4 MiB


def encode_payload_from_symbols(sym: jax.Array, n_valid, entry_tbl: jax.Array,
                                S: int, interpret: bool = False,
                                min_mgw_rows: int = 0, min_p_rows: int = 0,
                                rows: int = ROWS, probe: str = "",
                                spec_rows: int = 0):
    """Full device lockstep encode: u8 symbols (padded to a group multiple)
    -> (payload u32 device, padded group word counts np.int64).

    Shipping r5 path: byte transpose -> lane_totals Pallas pass ->
    reverse-sweep kernel with the in-kernel byte LUT (requires codebook
    max_len <= 26).  The pre-r5 path (materialized u32 entries via
    prepare_entry_fused) stays reachable with probe='nobytelut' for A/B."""
    if "nobytelut" in probe:
        entry, ctot, gw = prepare_entry_fused(sym, n_valid, entry_tbl, S,
                                              interpret=interpret, rows=rows)
        return _launch(entry, ctot, gw, S, interpret, min_mgw_rows,
                       min_p_rows, rows, probe)
    if sym.shape[0] >= (1 << 31):  # assert would vanish under -O and let
        raise ValueError(           # the in-kernel i32 orig index wrap
            f"dispatch chunk of {sym.shape[0]} symbols exceeds the in-kernel "
            "int32 index range; dispatch in chunks below 2^31 symbols")
    sym_t = bytes_stepmajor(sym, S, rows)
    ctot, gw = lane_totals(sym_t, entry_tbl, n_valid, S, pick_chunk(S, rows),
                           interpret=interpret, rows=rows)
    return _launch(sym_t, ctot, gw, S, interpret, min_mgw_rows, min_p_rows,
                   rows, probe, entry_tbl=entry_tbl, n_valid=n_valid,
                   spec_rows=0 if "nospec" in probe else spec_rows)


def encode_payload_from_entries(ent_flat: jax.Array, S: int,
                                interpret: bool = False, rows: int = ROWS):
    """Device lockstep encode from pre-gathered fused entry words (HuffWord
    token path: per-token lj|len values already selected by parity
    dictionary on the host, zero past the valid token count).

    ent_flat: u32 [n] lane-major, n a multiple of rows*LANES*S.
    Returns (payload u32 device, padded group word counts np.int64)."""
    entry, ctot, gw = prepare_entry_words(ent_flat, S, rows)
    return _launch(entry, ctot, gw, S, interpret, rows=rows)


def reorder_payload_pallas(lj: jax.Array, lens: jax.Array, S: int,
                           interpret: bool = False, rows: int = ROWS):
    """Full device encode reorder: flat lane-major (lj, lens) ->
    (payload u32 device [words], group_words_padded np.int64 [n_groups]).

    Replaces exp/reorder.reorder_payload_device.  Group segments are
    128-word aligned (trailing zeros), and group_words_padded reflects the
    padded counts — store them directly as the container's group table."""
    entry, ctot, gw = prepare_entry(lj, lens, S, rows)
    return _launch(entry, ctot, gw, S, interpret, rows=rows)
