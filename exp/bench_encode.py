"""Encode-kernel experiment: probe knockouts on the real chip (the encode
side of exp/bench_decode.py).  Not part of the shipping bench; results in
PERFORMANCE.md.

Usage: python exp/bench_encode.py
Env: GLZ_BENCH_MB (default 64), GLZ_BENCH_STREAM (default 512),
     GLZ_EXP_ROWS (default 64),
     GLZ_EXP_PROBES (comma-separated probe sets, default a full sweep).
Flags: noemit (skip emit entirely), norank (lane_id instead of MXU rank),
nobfly (skip the butterfly compaction), nostore (skip the staging OR
stores), noprepend (skip the window shift).  Those knockouts corrupt the
payload — diagnostic timing only.  Valid A/B variants (bit-exact):
noebatch (per-substep emission instead of the r5 batched one),
unroll8/unroll16 (wider emission batches), nobytelut (materialized-entry
pipeline via encode_payload_from_symbols — see exp/r5_session.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "64"))
    S = int(os.environ.get("GLZ_BENCH_STREAM", "512"))
    rows = int(os.environ.get("GLZ_EXP_ROWS", "64"))
    probes = os.environ.get(
        "GLZ_EXP_PROBES",
        ",noemit,norank,nobfly,nostore,noprepend,noemit+noprepend").split(",")
    n = mb << 20

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GLZ_JAX_CACHE", "/tmp/glz_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from bench import make_corpus
    from glz_tpu.core.codebook import build_codebook, sampled_histogram
    from glz_tpu.ops import pallas_encode as pe

    log(f"devices: {jax.devices()}  S={S} rows={rows}  {mb} MiB")
    arr = make_corpus(n)
    cb = build_codebook(sampled_histogram(arr, 8 << 20), pe.MAX_FUSED_LEN)
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    group_syms = rows * 128 * S
    padded_n = -(-n // group_syms) * group_syms
    data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))

    # separate the prep (LUT/transpose) pass from the sweep kernel
    ent, ctot, gw = pe.prepare_entry_fused(data, jnp.int32(n), entry_tbl, S,
                                           rows=rows)
    jax.block_until_ready(ent)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(pe.prepare_entry_fused(
            data, jnp.int32(n), entry_tbl, S, rows=rows)[0])
        ts.append(time.perf_counter() - t0)
    log(f"prepare_entry_fused: {min(ts)*1e3:.2f} ms = {n/min(ts)/1e9:.3f} GB/s")

    gw_np = np.asarray(gw).astype(np.int64)
    padded = -(-gw_np // 128) * 128
    grow = (np.cumsum(padded) - padded) // 128
    mgw_rows = max(-(-int(-(-gw_np.max() // 128)) // 512) * 512, 512)
    p_rows = -(-(int(grow[-1]) + mgw_rows) // 4096) * 4096
    args = (ent, ctot, jnp.asarray(gw_np.astype(np.int32)),
            jnp.asarray(grow.astype(np.int32)))

    for probe in probes:
        pr = probe.replace("+", ",")
        def enc():
            return pe.encode_groups(*args, S, pe.pick_chunk(S, rows),
                                    mgw_rows, p_rows, rows=rows, probe=pr)
        t0 = time.perf_counter()
        jax.block_until_ready(enc())
        log(f"probe='{pr}': compile+run {time.perf_counter()-t0:.1f} s")
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(enc())
            ts.append(time.perf_counter() - t0)
        log(f"probe='{pr}': {min(ts)*1e3:.2f} ms = {n/min(ts)/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
