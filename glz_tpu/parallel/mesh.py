"""Device-mesh parallel codec pipeline.

The reference has zero parallelism (SURVEY.md §2: single-threaded file
streamer; its "backend" is libc FILE*, buffer.h:304).  The TPU-native
equivalents built here (BASELINE north star):

  * block data parallelism — streams sharded across chips on a 1- or 2-axis
    `jax.sharding.Mesh`;
  * replicated codebook — LUTs broadcast to every chip (the "shared
    codebook broadcast" of multi-host configs);
  * ordered collection — fixed-shape `all_gather` of per-stream bit lengths
    and padded payload words, trimmed on host into the file-order container
    (collectives ride ICI/DCN; no NCCL analogue is written, XLA inserts
    them).

All functions are shard_map'd so they also run multi-host under
`jax.distributed.initialize` (see glz_tpu.parallel.multihost).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from glz_tpu.ops import decode as decode_ops
from glz_tpu.ops import encode as encode_ops


def make_mesh(n_devices: int | None = None, axis_names=("data",), shape=None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.asarray(devs[:n_devices])
    if shape is None:
        shape = (n_devices,)
    return Mesh(devs.reshape(shape), axis_names)


def sharded_histogram(mesh: Mesh, data: jax.Array) -> jax.Array:
    """Global byte histogram of data sharded along axis 0: local scatter-add
    histogram + psum over the mesh (the reduction the reference does with a
    serial fread loop, encoder.h:136-150)."""
    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(axes),
        out_specs=P(),
    )
    def hist(local):
        h = jnp.zeros(256, jnp.int32).at[local.astype(jnp.int32)].add(1)
        return jax.lax.psum(h, axes)

    return jax.jit(hist)(data)


def sharded_encode(mesh: Mesh, sym: jax.Array, n_valid: jax.Array,
                   code_lut: jax.Array, len_lut: jax.Array,
                   stream_symbols: int):
    """Encode `sym` (padded to devices*stream multiple, sharded on axis 0).

    Returns (words [D, local_n+1], total_bits [D], stream_bits [n_streams])
    — per-device payload word arrays (bit-packed from bit 0 of each shard)
    plus the global per-stream bit table gathered in file order.  Shards
    are word-aligned by construction, so the host stitches by trimming each
    shard's words to ceil(local_bits/32) and recording the alignment pad in
    the shard's last stream (models/canonical_byte.py does the same for
    dispatch chunking).
    """
    axes = mesh.axis_names
    n = sym.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    local_n = n // n_dev
    assert n % n_dev == 0 and local_n % stream_symbols == 0

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(), P(), P()),
        out_specs=(P(axes), P(axes), P(axes)),
    )
    def enc(local, n_valid_, code_lut_, len_lut_):
        dev = jax.lax.axis_index(axes[0]) if len(axes) == 1 else (
            jax.lax.axis_index(axes[0]) * jax.lax.axis_size(axes[1]) + jax.lax.axis_index(axes[1]))
        base = dev * local_n
        local_valid = jnp.clip(n_valid_ - base, 0, local_n)
        words, total_bits, stream_bits = encode_ops.encode_block(
            local, local_valid.astype(jnp.int32), code_lut_, len_lut_, stream_symbols)
        return words[None], total_bits[None], stream_bits[None]

    return jax.jit(enc)(sym, n_valid, code_lut, len_lut)


def sharded_decode(mesh: Mesh, words: jax.Array, stream_starts: jax.Array,
                   luts, stream_symbols: int, table_bits: int):
    """Decode streams sharded across the mesh: payload words replicated,
    per-stream start offsets sharded on axis 0.  Output [D, S, local_L]
    gathers to file order on the host (or stays sharded for fused pipelines).
    """
    axes = mesh.axis_names
    lut, fc_lj, sp, syms = luts

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axes), P(), P(), P(), P()),
        out_specs=P(axes),
    )
    def dec(words_, starts_, lut_, fc_, sp_, syms_):
        out = decode_ops.decode_block(
            words_, starts_, lut_, fc_, sp_, syms_, stream_symbols, table_bits)
        return out[None]

    return jax.jit(dec, static_argnames=())(words, stream_starts, lut, fc_lj, sp, syms)


def codec_step(mesh: Mesh, sym: jax.Array, n_valid: jax.Array,
               code_lut: jax.Array, len_lut: jax.Array,
               luts, stream_symbols: int, table_bits: int):
    """One full sharded codec step: encode all shards, reconstruct global
    stream offsets (word-aligned shard stitching), decode back, verify
    shape.  This is the framework's 'training step' analogue used by
    multi-chip dry runs and scaling benchmarks."""
    words, total_bits, stream_bits = sharded_encode(
        mesh, sym, n_valid, code_lut, len_lut, stream_symbols)
    # shard-local payloads are decoded with shard-local offsets: exclusive
    # cumsum of each shard's stream bits
    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(axes), P(), P(), P(), P()),
        out_specs=P(axes),
    )
    def dec(words_, sbits_, lut_, fc_, sp_, syms_):
        sbits = sbits_[0]
        starts = (jnp.cumsum(sbits) - sbits).astype(jnp.uint32)
        out = decode_ops.decode_block(
            words_[0], starts, lut_, fc_, sp_, syms_, stream_symbols, table_bits)
        return out[None]

    lut, fc_lj, sp, syms = luts
    out = jax.jit(dec)(words, stream_bits, lut, fc_lj, sp, syms)
    return words, total_bits, stream_bits, out
