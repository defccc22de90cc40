"""Multi-host orchestration (the reference has nothing distributed —
SURVEY.md §2 'Parallelism / distributed components').

Standard JAX pattern: every host runs the same program under
`jax.distributed.initialize`, the global mesh spans all hosts' chips, each
host feeds its local shard of the input, collectives ride ICI within hosts
and DCN across hosts, and host 0 assembles the file-order container.

Usage (one process per host):

    from glz_tpu.parallel import multihost
    multihost.initialize(coordinator, num_processes, process_id)
    blob = multihost.compress_bytes_multihost(local_bytes, total_size, S=2048)

CPU simulation for CI: run N processes with JAX_PLATFORMS=cpu and
jax.distributed; tests/test_sharding.py covers the single-process
multi-device path on the virtual 8-device mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glz_tpu.parallel import mesh as pmesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op for single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "data") -> jax.sharding.Mesh:
    return pmesh.make_mesh(len(jax.devices()), axis_names=(axis_name,))


def compress_bytes_multihost(local_data: bytes, conf=None, stream_symbols: int = 1 << 18):
    """Each host compresses its local shard; host 0 gathers the per-stream
    bit tables (fixed shape all_gather) and payload word counts, then
    assembles the in-order container from per-host payloads.

    The heavy payload transfer uses jax.experimental.multihost_utils
    process_allgather on word-aligned payloads (ragged sizes padded to the
    max then trimmed — BASELINE config 5's 'gather sizes first, then padded
    payloads' recipe).
    """
    from jax.experimental import multihost_utils

    from glz_tpu import config as cfg
    from glz_tpu.core import container
    from glz_tpu.core.api import compress_bytes_host

    conf = conf or cfg.GlzConfig(stream_symbols=stream_symbols)
    if jax.process_count() == 1:
        return compress_bytes_host(local_data, conf)

    # The stitched container records one global stream_symbols and the
    # decoder maps stream k to symbols [k*S, (k+1)*S); a non-last shard
    # whose size is not a multiple of S would end with a short stream and
    # silently desynchronize every later shard — reject it loudly.
    if (jax.process_index() < jax.process_count() - 1
            and len(local_data) % conf.stream_symbols):
        raise ValueError(
            f"shard of {len(local_data)} bytes on host {jax.process_index()} "
            f"is not a multiple of stream_symbols={conf.stream_symbols}; "
            "align shard boundaries to streams (only the last host may hold "
            "a partial stream)")

    # shared codebook: psum of local histograms across hosts, deterministic
    # construction everywhere (the "broadcast codebook" of BASELINE config 5)
    from glz_tpu.core.codebook import build_codebook, histogram_bytes
    local_hist = histogram_bytes(np.frombuffer(local_data, np.uint8))
    global_hist = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(local_hist))).sum(axis=0)
    cb = build_codebook(global_hist.astype(np.int64), conf.length_limit)
    local_blob = compress_bytes_host(local_data, conf, codebook=cb)

    f = container.read_container(local_blob)
    sizes = multihost_utils.process_allgather(
        jnp.asarray([len(f.payload), f.n_streams, f.n_symbols], jnp.int64))
    max_pay = int(np.max(sizes[:, 0]))
    pad = np.zeros(max_pay, np.uint8)
    pad[: len(f.payload)] = np.frombuffer(f.payload, np.uint8)
    payloads = multihost_utils.process_allgather(jnp.asarray(pad))
    max_streams = int(np.max(sizes[:, 1]))
    sb = np.zeros(max_streams, np.uint64)
    sb[: f.n_streams] = f.stream_bits
    tables = multihost_utils.process_allgather(jnp.asarray(sb.astype(np.int64)))

    if jax.process_index() != 0:
        return None
    # host 0: stitch shards in process order (file order)
    parts = []
    bits_tables = []
    n_total = 0
    for p in range(jax.process_count()):
        pay_len, n_streams, n_syms = (int(x) for x in sizes[p])
        body = np.asarray(payloads[p][:pay_len], np.uint8)
        tbl = np.asarray(tables[p][:n_streams], np.int64).astype(np.uint64)
        # inflate the shard's last stream advance to the byte-aligned size
        tbl[-1] += pay_len * 8 - int(tbl.sum())
        parts.append(body.tobytes())
        bits_tables.append(tbl)
        n_total += n_syms
    g = container.GlzFile(
        mode=f.mode,
        n_symbols=n_total,
        stream_symbols=f.stream_symbols,
        stream_bits=np.concatenate(bits_tables),
        codebook_blob=f.codebook_blob,  # identical on every host (shared code)
        payload=b"".join(parts),
    )
    return container.write_container(g)
