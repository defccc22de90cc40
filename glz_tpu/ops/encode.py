"""Device block encoder (XLA path).

The reference encodes with a serial per-byte, per-bit accumulator
(encode_each_byte -> Buffer::write_bit, canonical_huff_encoder.cc:270-285,
buffer.h:241-248) — a loop-carried dependency over the whole file.  Here the
whole dispatch is data-parallel:

    lens    = length_lut[sym]            (masked 0 beyond n_valid)
    offsets = exclusive_cumsum(lens)     (prefix sum — the TPU-native carry)
    words   = scatter-OR of each code's <=2 touched u32 words

Streams are bit-stitched by construction: stream k's first symbol lands at
the global bit offset equal to the sum of previous streams' bits, so one
flat pack produces the final payload AND the per-stream bit table.

Dispatch-size contract: n <= 2^26 symbols per call keeps total bits < 2^31
so u32/i32 prefix sums are exact without x64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_DISPATCH_SYMBOLS = 1 << 26


@functools.partial(jax.jit, static_argnames=("stream_symbols",), donate_argnums=())
def encode_block(
    sym: jax.Array,           # u8/i32 [N] padded symbol ids
    n_valid: jax.Array,       # i32 scalar, actual symbol count
    code_lut: jax.Array,      # u32 [n_symbols] canonical codewords
    len_lut: jax.Array,       # i32 [n_symbols] code lengths
    stream_symbols: int,
):
    """Returns (words u32[N+1], total_bits i32, stream_bits i32[N//S]).

    N must be a multiple of stream_symbols.  words[:ceil(total_bits/32)] is
    the MSB-first payload (big-endian bit order within each u32).
    """
    n = sym.shape[0]
    assert n % stream_symbols == 0, "pad input to a stream multiple"
    idx = sym.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    valid = pos < n_valid
    lens = jnp.where(valid, len_lut[idx], 0).astype(jnp.uint32)
    codes = jnp.where(valid, code_lut[idx], 0).astype(jnp.uint32)

    ends = jnp.cumsum(lens, dtype=jnp.uint32)
    offsets = ends - lens
    total_bits = ends[-1].astype(jnp.int32)

    # left-justify codes in 32 bits; lens==0 contributes nothing
    sh = (jnp.uint32(32) - jnp.maximum(lens, 1)).astype(jnp.uint32)
    lj = jnp.where(lens > 0, codes << sh, jnp.uint32(0))

    phase = offsets & jnp.uint32(31)
    lo_idx = (offsets >> jnp.uint32(5)).astype(jnp.int32)
    lo = lj >> phase
    hi = jnp.where(phase > 0, lj << ((jnp.uint32(32) - phase) & jnp.uint32(31)), jnp.uint32(0))

    # OR == ADD here: bit ranges within a word are disjoint by construction
    words = jnp.zeros(n + 1, jnp.uint32)
    words = words.at[lo_idx].add(lo, mode="drop")
    words = words.at[lo_idx + 1].add(hi, mode="drop")

    stream_bits = lens.reshape(n // stream_symbols, stream_symbols).sum(
        axis=1, dtype=jnp.uint32).astype(jnp.int32)
    return words, total_bits, stream_bits


@functools.partial(jax.jit, static_argnames=("stream_symbols",))
def pack_lj(lj: jax.Array, lens: jax.Array, stream_symbols: int):
    """Bit-pack pre-left-justified codes.

    lj: u32 [N] codes already shifted to the top `lens` bits; lens: u32 [N]
    (0 for padding positions).  Same scatter-OR scheme as encode_block; the
    table lookups happen upstream (Pallas lut256 on TPU — XLA's gather is
    ~84 M elem/s on v5e while cumsum+scatter run at >100 G elem/s).
    """
    n = lj.shape[0]
    ends = jnp.cumsum(lens, dtype=jnp.uint32)
    offsets = ends - lens
    total_bits = ends[-1].astype(jnp.int32)

    phase = offsets & jnp.uint32(31)
    lo_idx = (offsets >> jnp.uint32(5)).astype(jnp.int32)
    lo = lj >> phase
    hi = jnp.where(phase > 0, lj << ((jnp.uint32(32) - phase) & jnp.uint32(31)), jnp.uint32(0))

    words = jnp.zeros(n + 1, jnp.uint32)
    words = words.at[lo_idx].add(lo, mode="drop")
    words = words.at[lo_idx + 1].add(hi, mode="drop")

    stream_bits = lens.reshape(n // stream_symbols, stream_symbols).sum(
        axis=1, dtype=jnp.uint32).astype(jnp.int32)
    return words, total_bits, stream_bits


def lookup_lj_lens(sym: jax.Array, n_valid, lj_tbl: jax.Array,
                   len_tbl: jax.Array, max_len: int,
                   interpret: bool | None = None):
    """Per-symbol (left-justified code, length), masked past n_valid.

    Compiling two independent Pallas gather kernels into one XLA module is
    pathological on Mosaic (hangs/1000x slowdowns observed), so when
    max_len <= 26 the two tables are fused into one entry table
    (lj | len: a left-justified code of length <= 26 has zero low bits);
    otherwise two separate gathers are used.
    """
    from glz_tpu.ops.pallas_lut import lut256

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = sym.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    valid = pos < n_valid
    if max_len <= 26:
        entry = lut256(sym, lj_tbl | len_tbl, interpret=interpret)
        entry = jnp.where(valid, entry, jnp.uint32(0))
        lens = entry & jnp.uint32(63)
        lj = entry & ~jnp.uint32(63)
    else:
        lens = jnp.where(valid, lut256(sym, len_tbl, interpret=interpret), jnp.uint32(0))
        lj = jnp.where(valid, lut256(sym, lj_tbl, interpret=interpret), jnp.uint32(0))
    return lj, lens


def encode_block_fast(sym: jax.Array, n_valid: jax.Array,
                      lj_tbl: jax.Array, len_tbl: jax.Array,
                      stream_symbols: int, interpret: bool | None = None,
                      max_len: int = 32):
    """TPU fast path: Pallas 256-table lookup + XLA prefix-sum/scatter pack.

    sym must be padded to a multiple of 64 KiB and of stream_symbols.
    lj_tbl[b] = codeword[b] << (32 - length[b]); len_tbl[b] = length[b].
    """
    lj, lens = lookup_lj_lens(sym, n_valid, lj_tbl, len_tbl, max_len, interpret)
    return pack_lj(lj, lens, stream_symbols)
