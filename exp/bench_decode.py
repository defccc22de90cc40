"""Decode-kernel experiment: gpi (groups per kernel instance) and group
geometry (rows) sweeps on the real chip.  Not part of the shipping bench;
see PERFORMANCE.md for results.

Usage: python exp/bench_decode.py [gpi ...]   (default: 1)
Env: GLZ_BENCH_MB (default 64), GLZ_BENCH_STREAM (default 2048),
     GLZ_EXP_ROWS (comma-separated group rows, default "8"),
     GLZ_EXP_PROBES (comma-separated probe sets, default baseline only).
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
    S = int(os.environ.get("GLZ_BENCH_STREAM", "2048"))
    gpis = [int(x) for x in sys.argv[1:]] or [1]
    rows_list = [int(x) for x in
                 os.environ.get("GLZ_EXP_ROWS", "8").split(",")]
    n = mb << 20

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GLZ_JAX_CACHE", "/tmp/glz_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from bench import make_corpus
    from glz_tpu.core.codebook import build_codebook, sampled_histogram
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops import pallas_encode as pe

    log(f"devices: {jax.devices()}  S={S}  {mb} MiB  gpis={gpis}  rows={rows_list}")
    arr = make_corpus(n)
    cb = build_codebook(sampled_histogram(arr, 8 << 20), pe.MAX_FUSED_LEN)
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols

    # GLZ_EXP_PROBES: comma-separated probe sets ('+' joins flags within a
    # set; empty string = the shipping kernel).  Flags: rollrank, norank,
    # noscan, nogather, nosym, noksum, noab, nowhen, statwin, unroll.
    # Default: baseline only.  See PERFORMANCE.md for the r3 sweep results.
    probes = os.environ.get("GLZ_EXP_PROBES", "").split(",")

    for rows in rows_list:
        group_syms = rows * 128 * S
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))

        t0 = time.perf_counter()
        payload, gw_np = pe.encode_payload_from_symbols(
            data, jnp.int32(n), entry_tbl, S, rows=rows)
        payload.block_until_ready()
        t_first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            pe.encode_payload_from_symbols(
                data, jnp.int32(n), entry_tbl, S, rows=rows)[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        log(f"rows={rows}: encode compile+run {t_first:.1f} s; steady "
            f"{min(ts)*1e3:.2f} ms = {n/min(ts)/1e9:.3f} GB/s")

        n_groups = gw_np.size
        group_starts = np.cumsum(gw_np) - gw_np
        group_counts = np.clip(n - np.arange(n_groups) * group_syms, 0, group_syms)
        need = int(gw_np.max()) + rows * 128 + 256
        mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
        dargs = (payload,
                 jnp.asarray(group_starts.astype(np.int32)),
                 jnp.asarray(group_counts.astype(np.int32)),
                 jnp.asarray(cb.first_code_left_justified()),
                 jnp.asarray(cb.decode_offsets()),
                 jnp.asarray(symtab))
        log(f"rows={rows}: {n_groups} groups, mgw={mgw}, "
            f"len range [{cb.min_len},{cb.max_len}]")

        variants = [(gpi, p.replace("+", ",")) for gpi in gpis for p in probes]
        for gpi, probe in variants:
            tag = f"rows={rows} gpi={gpi} probe='{probe}'"
            def dec():
                return pd.decode_groups(*dargs, S, cb.min_len, cb.max_len, mgw,
                                        gpi=gpi, probe=probe, rows=rows)
            t0 = time.perf_counter()
            out = jax.block_until_ready(dec())
            log(f"{tag}: compile+run {time.perf_counter()-t0:.1f} s")
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(dec())
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            flat = np.asarray(pd.unpack_symbols(out, S, rows))[:n]
            ok = np.array_equal(flat, arr)
            log(f"{tag}: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s  "
                f"roundtrip={'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
