"""Device block decoder (XLA path).

Huffman decode has a loop-carried dependency per stream (the reference's
three decoders are all strictly serial over the file,
canonical_huff_encoder.cc:377-568).  The TPU formulation decodes MANY
streams in lockstep: lanes = streams, one fori_loop step decodes one symbol
per stream:

    v      = next 32 payload bits at each lane's bit cursor (left-justified)
    entry  = lut[v >> (32-table_bits)]           # (length<<16 | symbol)
    escape = symbol == 0xFFFF                    # code longer than the table
    length = escape ? table_bits+1 + popcount-style cfind : entry>>16
    out[step, lane] = symbol;  cursor += length

The cfind slow path is branch-free: length = first l with v >= fc_lj[l],
computed as (table_bits+1) + sum_l [v < fc_lj[l]] over the static range
(monotone because left-justified first codes are non-increasing in l) —
the vector analogue of the reference's linear scan (cc:558-562).

All streams decode exactly `stream_symbols` symbols (the last, ragged
stream produces masked garbage past its end; gathers clip in-bounds).
Output is [stream_symbols, n_streams]; transpose+reshape restores file
order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_CODE_LEN = 32


@functools.partial(jax.jit, static_argnames=("stream_symbols", "table_bits"))
def decode_block(
    words: jax.Array,        # u32 [W] payload, big-endian bit order
    stream_starts: jax.Array,  # u32 [L] absolute start bit of each stream
    lut: jax.Array,          # u32 [2^table_bits] (len<<16|sym), sym 0xFFFF=escape
    fc_slow: jax.Array,      # u32 [MAX_CODE_LEN+2] left-justified first codes,
                             #     0 for l > max_len (see Codebook.decode_luts)
    start_pos: jax.Array,    # u32 [MAX_CODE_LEN+2]
    symbols: jax.Array,      # u32 [n_symbols]
    stream_symbols: int,
    table_bits: int,
):
    """Returns u8 [stream_symbols, n_streams] decoded symbols (byte mode)."""
    n_streams = stream_starts.shape[0]
    # pad payload so cursor overruns gather in-bounds
    padded = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])

    shift_tb = jnp.uint32(32 - table_bits)

    def step(s, carry):
        cursor, out = carry
        w_idx = (cursor >> jnp.uint32(5)).astype(jnp.int32)
        phase = cursor & jnp.uint32(31)
        hi = padded[w_idx]
        lo = padded[w_idx + 1]
        # 32-bit window starting at cursor, left-justified
        v = jnp.where(
            phase > 0,
            (hi << phase) | (lo >> ((jnp.uint32(32) - phase) & jnp.uint32(31))),
            hi,
        )
        entry = lut[(v >> shift_tb).astype(jnp.int32)]
        length = (entry >> jnp.uint32(16)).astype(jnp.uint32)
        sym = entry & jnp.uint32(0xFFFF)
        escape = sym == jnp.uint32(0xFFFF)

        # cfind slow path: smallest l > table_bits with v >= fc_slow[l]
        slow_len = jnp.full_like(length, table_bits + 1)
        for l in range(table_bits + 1, MAX_CODE_LEN + 1):
            slow_len = slow_len + (v < fc_slow[l]).astype(jnp.uint32)
        length = jnp.where(escape, slow_len, length)
        # symbol via (start_pos, first_code) arithmetic — exact reference
        # indexing (cc:456): symbol_[start_pos[len] + ((v - fc_lj[len]) >> (32-len))]
        li = length.astype(jnp.int32)
        fcv = fc_slow[li]
        rank = (v - fcv) >> ((jnp.uint32(32) - length) & jnp.uint32(31))
        slow_sym = symbols[(start_pos[li] + rank).astype(jnp.int32)]
        sym = jnp.where(escape, slow_sym.astype(jnp.uint32), sym)

        out = jax.lax.dynamic_update_slice(out, sym.astype(jnp.uint8)[None, :], (s, 0))
        return cursor + length, out

    cursor0 = stream_starts.astype(jnp.uint32)
    # derive the output buffer from the (possibly shard_map-varying) starts
    # so carry types match under manual sharding
    out0 = jnp.broadcast_to((cursor0 * 0).astype(jnp.uint8)[None, :],
                            (stream_symbols, n_streams))
    _, out = jax.lax.fori_loop(0, stream_symbols, step, (cursor0, out0))
    return out


def assemble(out: jax.Array, n_total: int) -> jax.Array:
    """[S, L] -> flat [n_total] in file order (stream-major)."""
    return out.T.reshape(-1)[:n_total]
