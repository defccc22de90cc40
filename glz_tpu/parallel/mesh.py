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
from jax.sharding import Mesh, PartitionSpec as P
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
    """Global byte histogram of data sharded along axis 0: local device
    histogram (ops/histogram.py picks scatter vs MXU one-hot matmul by
    size/backend) + psum over the mesh (the reduction the reference does
    with a serial fread loop, encoder.h:136-150)."""
    from glz_tpu.ops import histogram as hist_ops

    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(axes),
        out_specs=P(),
    )
    def hist(local):
        return jax.lax.psum(hist_ops.histogram(local), axes)

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


def _flat_device_index(axes):
    """Linear device index over a 1- or 2-axis mesh (row-major)."""
    if len(axes) == 1:
        return jax.lax.axis_index(axes[0])
    return (jax.lax.axis_index(axes[0]) * jax.lax.axis_size(axes[1])
            + jax.lax.axis_index(axes[1]))


def lockstep_codec_step(mesh: Mesh, sym: jax.Array, n_valid,
                        entry_tbl: jax.Array, fc_lj: jax.Array,
                        offsets: jax.Array, symtab: jax.Array,
                        S: int, min_len: int, max_len: int,
                        interpret: bool | None = None, rows: int = 8,
                        max_bits_per_symbol: int | None = None):
    """The flagship lockstep kernels on the mesh: groups (1024 streams x S
    symbols) are the shard unit, the codebook tables are replicated, and the
    per-group word counts are all_gather'd so every device (and the host)
    can assemble the container's group table in file order.

    Per device: fused LUT/transpose prep -> reverse-sweep Pallas encode into
    a fixed-stride padded payload (stride = the <=max_len worst case, so the
    geometry is static under jit) -> dual-register lockstep Pallas decode of
    the same groups.  Returns (payload [n_groups*stride_rows, 128] u32
    sharded, gw_all [n_groups] i32 replicated, out [n_groups, S//4*ROWS,
    LANES] u32 sharded packed symbols).

    This replaces the reference's one serial stream
    (canonical_huff_encoder.cc:270-285) with n_devices * 1024 concurrent
    streams; BASELINE configs 4/5 ride this path.
    """
    from glz_tpu.core.lockstep import LANES as L
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops import pallas_encode as pe

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axes = mesh.axis_names
    n_dev = int(np.prod(mesh.devices.shape))
    n = sym.shape[0]
    G = rows * L
    group_syms = G * S
    n_groups = n // group_syms
    assert n % group_syms == 0 and n_groups % n_dev == 0, (
        "pad input to a whole number of groups per device")
    local_groups = n_groups // n_dev
    local_n = n // n_dev
    # static payload stride per group: worst case every symbol takes max_len
    # bits, plus the decoder's window slack (phantom reads past a lane's
    # last real word never exceed the window rows).  Callers that know
    # their data (e.g. a steady pipeline re-running on same-entropy
    # shards) can pass max_bits_per_symbol to shrink the HBM transient
    # from the max_len worst case (~3-5x the real payload) to a measured
    # bound — the kernel DMAs only each group's real rows either way, so
    # an over-tight bound corrupts, pick it with margin.
    bps = max_bits_per_symbol if max_bits_per_symbol is not None else max_len
    if bps < 1:
        raise ValueError(f"max_bits_per_symbol must be >= 1, got {bps}")
    stride_rows = -(-(group_syms * bps // 32 + 2 * G) // L) + 2 * rows
    check_stride = max_bits_per_symbol is not None

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(), P(), P(), P()),
        out_specs=(P(axes), P(), P(axes)),
        check_vma=False,  # pallas_call's out_shape carries no vma info
    )
    def step(local, entry_tbl_, fc_, off_, symtab_):
        dev = _flat_device_index(axes)
        base = dev * local_n
        local_valid = jnp.clip(n_valid - base, 0, local_n).astype(jnp.int32)
        # r5 shipping encode pipeline (byte transpose + lane_totals + the
        # in-kernel byte LUT) — everything stays on-device: gw feeds the
        # kernel via scalar prefetch, no host sync inside shard_map
        sym_t = pe.bytes_stepmajor(local, S, rows)
        ctot, gw = pe.lane_totals(sym_t, entry_tbl_, local_valid, S,
                                  pe.pick_chunk(S, rows),
                                  interpret=interpret, rows=rows)
        grow = jax.lax.broadcasted_iota(jnp.int32, (local_groups,), 0) * stride_rows
        payload = pe.encode_groups(
            sym_t, ctot, gw, grow, S, pe.pick_chunk(S, rows), stride_rows,
            local_groups * stride_rows, interpret=interpret, rows=rows,
            entry_tbl=entry_tbl_, n_valid=local_valid)
        # group word table in file order: all_gather over the mesh (the
        # "gather sizes first" half of the BASELINE config 5 recipe)
        gw_all = jax.lax.all_gather(gw, axes, tiled=True)
        counts = jnp.clip(
            local_valid - jax.lax.broadcasted_iota(jnp.int32, (local_groups,), 0)
            * group_syms, 0, group_syms)
        starts = grow * L
        out = pd.decode_groups(
            payload.reshape(-1), starts, counts, fc_, off_, symtab_,
            S, min_len, max_len, stride_rows * L, interpret=interpret,
            rows=rows)
        return payload, gw_all, out

    payload, gw_all, out = jax.jit(step)(sym, entry_tbl, fc_lj, offsets,
                                         symtab)
    if check_stride:
        worst = int(np.max(np.asarray(gw_all)))
        # the decode kernel's (rows+1)-row window slice must stay inside
        # the per-group stride block even at the final payload rows, so
        # the safe band excludes the last rows+1 rows — a count inside
        # that band would clamp the window slice and corrupt silently
        if worst > (stride_rows - rows - 1) * L:
            raise ValueError(
                f"max_bits_per_symbol={max_bits_per_symbol} too tight: a "
                f"group produced {worst} payload words > safe bound "
                f"{(stride_rows - rows - 1) * L} (stride {stride_rows * L} "
                "minus the decoder's window slack); this step's outputs "
                "are invalid — raise the bound")
    return payload, gw_all, out


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
