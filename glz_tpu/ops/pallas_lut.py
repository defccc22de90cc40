"""Pallas small-table lookup kernel.

XLA's general gather on TPU is catastrophically slow (~84M elem/s measured
on v5e) while Mosaic lowers take_along_axis to a fast in-vreg lane gather
(~200 G elem/s measured).  A 256-entry table becomes 2 rows of 128 lanes:

    row  = byte >> 7, col = byte & 127
    cand_r = take_along_axis(broadcast(table[r]), col, axis=1)   r = 0, 1
    out    = select(row == r, cand_r)

One kernel = one gather = one output: Mosaic compiles two independent
gathers with two outputs in a single kernel pathologically (measured 28 ms
vs 0.08 ms — see git history), so callers invoke this once per table.

This replaces the reference's per-byte codeword_[key]/length_[key] array
indexing inside its serial encode loop (canonical_huff_encoder.cc:270-285).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 512  # rows of 128 bytes per grid step


def _lut256_kernel(bytes_ref, tbl_ref, out_ref):
    b = bytes_ref[:].astype(jnp.int32)
    row = b >> 7
    col = b & 127
    out = jnp.zeros(b.shape, jnp.uint32)
    for r in range(2):
        t_row = jnp.broadcast_to(tbl_ref[r : r + 1, :], b.shape)
        cand = jnp.take_along_axis(t_row, col, axis=1)
        out = jnp.where(row == r, cand, out)
    out_ref[:] = out


MAX_LUT_ROWS = 512  # big-table gather cap: 512 rows x 128 = 65536 entries


def _lut_big_kernel_factory(n_rows: int):
    UNROLL = 8  # table rows per fori iteration (n_rows padded to a multiple)

    def kernel(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[:].astype(jnp.int32)
        row = idx >> 7
        col = idx & 127

        # rolled row-select chain: a fully unrolled chain keeps every
        # iteration's temporaries live on the Mosaic stack and blows scoped
        # VMEM past ~100 rows; fori reuses the buffers
        def body(rb, out):
            for j in range(UNROLL):
                r = rb * UNROLL + j
                t_row = jnp.broadcast_to(tbl_ref[pl.ds(r, 1), :], idx.shape)
                cand = jnp.take_along_axis(t_row, col, axis=1)
                out = jnp.where(row == r, cand, out)
            return out

        out_ref[:] = jax.lax.fori_loop(
            0, n_rows // UNROLL, body, jnp.zeros(idx.shape, jnp.uint32))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut_table(idx: jax.Array, table: jax.Array,
              interpret: bool = False) -> jax.Array:
    """idx: int [N] in [0, table.size) -> table[idx] as u32 [N], for
    tables up to MAX_LUT_ROWS*128 = 64K entries (the HuffWord pack2 case).

    XLA's general gather runs at ~84M elem/s on TPU; this kernel holds the
    whole table in VMEM and resolves each entry with an in-vreg lane
    gather per candidate table row (row-select chain, the _row_gather
    pattern) — ~15x faster at vocabulary sizes, which made it the r5 fix
    for the HuffWord device codec's jnp.take bottleneck (both the encode
    entry gather and the decode rank->id map were ~0.45 s/49M tokens)."""
    v = table.shape[0]
    n_rows = -(-(-(-v // LANES)) // 8) * 8  # pad rows to the fori unroll
    assert n_rows <= MAX_LUT_ROWS, "use jnp.take for tables past 64K entries"
    pad_v = n_rows * LANES - v
    t2 = jnp.concatenate([table.astype(jnp.uint32),
                          jnp.zeros(pad_v, jnp.uint32)]).reshape(n_rows, LANES)
    n = idx.shape[0]
    blk = TILE * LANES
    pad_n = (-n) % blk
    d = jnp.concatenate([idx.reshape(-1),
                         jnp.zeros(pad_n, idx.dtype)]).reshape(-1, LANES)
    rows = d.shape[0]
    out = pl.pallas_call(
        _lut_big_kernel_factory(n_rows),
        grid=(rows // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        interpret=interpret,
    )(d, t2)
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut256(data: jax.Array, table: jax.Array, interpret: bool = False) -> jax.Array:
    """data: u8 [N] (N % 65536 == 0) -> table[data] as u32 [N].

    table: u32 [256].
    """
    n = data.shape[0]
    assert n % (TILE * LANES) == 0, "pad input to 64 KiB"
    rows = n // LANES
    d2 = data.reshape(rows, LANES)
    t2 = table.reshape(2, LANES)
    out = pl.pallas_call(
        _lut256_kernel,
        grid=(rows // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        interpret=interpret,
    )(d2, t2)
    return out.reshape(-1)
