"""r5 combined TPU experiment session — one process, one slow first
compile, then ~1 s per variant (see memory: axon tunnel compiles).

Executes the r4 VERDICT's deferred experiments for real, at the 512 MiB
scale where the headline is set:

  D1  decode baseline        rows=64, S=512, gpi=1
  D2  decode unroll=2        2 symbols/lane/step (chained canonical scans)
  D3  decode unroll=4
  D4  decode S=256 gpi=1     (fresh encode at S=256)
  D5  decode S=256 gpi=2     (the 64 MiB +6% point, now at scale)
  D6  decode S=256 gpi=2 u2
  E*  encode probe knockouts rows=64, S=512 (floor table for the encode
      kernel: noemit / norank / nobfly / nostore / noprepend)

All decode variants are VALID (round-trip-checked); encode probes corrupt
the payload and are timing-only.  Results go to PERFORMANCE.md.

Env: GLZ_BENCH_MB (default 512), GLZ_BENCH_REPEATS (default 5),
     GLZ_R5_PHASES (default "d512,e512,d256" — comma list).

Later r5 phases (all measured, see PERFORMANCE.md):
  r5b   byte-LUT vs entry-path encode, bounded vs full decode chain,
        dense-branch (identical lanes) hardware check
  esub  byte-LUT pipeline sub-phases (transpose / lane_totals / kernel)
  eu    emission batch width (unroll 4 vs 8 vs 16)
  eb    batched-emission A/B + encode knockouts on the r5 kernel
  dp    decode knockouts at 512 MiB (at-scale floor table)
  egap  where the pre-kernel ~37 ms goes (device work vs gw D2H sync)
  espec speculative geometry A/B + hardware round-trip
  dbnd  decode short-chain width sweep (bnd 8/12/16/24/off)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "512"))
    repeats = int(os.environ.get("GLZ_BENCH_REPEATS", "5"))
    phases = os.environ.get("GLZ_R5_PHASES", "d512,e512,d256").split(",")
    rows = 64
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

    log(f"devices: {jax.devices()}  {mb} MiB  rows={rows}  phases={phases}")
    interp = jax.default_backend() == "cpu"
    t0 = time.perf_counter()
    arr = make_corpus(n)
    log(f"corpus gen: {time.perf_counter()-t0:.1f} s")
    cb = build_codebook(sampled_histogram(arr, 8 << 20), pe.MAX_FUSED_LEN)
    entry_tbl = jnp.asarray(cb.left_justified_codes()
                            | cb.lengths.astype(np.uint32))
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    log(f"len range [{cb.min_len},{cb.max_len}]")

    def timeit(fn, reps=repeats):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def setup(S):
        group_syms = rows * 128 * S
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate(
            [arr, np.zeros(padded_n - n, np.uint8)]))
        t0 = time.perf_counter()
        payload, gw_np = pe.encode_payload_from_symbols(
            data, jnp.int32(n), entry_tbl, S, rows=rows, interpret=interp)
        payload.block_until_ready()
        log(f"S={S}: encode compile+run {time.perf_counter()-t0:.1f} s")
        t_enc = timeit(lambda: pe.encode_payload_from_symbols(
            data, jnp.int32(n), entry_tbl, S, rows=rows, interpret=interp)[0])
        log(f"S={S}: encode steady {t_enc*1e3:.2f} ms = {n/t_enc/1e9:.3f} GB/s")
        starts = np.cumsum(gw_np) - gw_np
        counts = np.clip(n - np.arange(gw_np.size) * group_syms, 0, group_syms)
        need = int(gw_np.max()) + rows * 128 + 256
        mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
        dargs = (payload,
                 jnp.asarray(starts.astype(np.int32)),
                 jnp.asarray(counts.astype(np.int32)),
                 jnp.asarray(cb.first_code_left_justified()),
                 jnp.asarray(cb.decode_offsets()),
                 jnp.asarray(symtab))
        return data, dargs, mgw, group_syms

    def dec_variant(tag, dargs, mgw, S, gpi=1, unroll=1, check=True):
        def dec():
            return pd.decode_groups(*dargs, S, cb.min_len, cb.max_len, mgw,
                                    gpi=gpi, rows=rows, unroll=unroll, interpret=interp)
        t0 = time.perf_counter()
        out = jax.block_until_ready(dec())
        log(f"{tag}: compile+run {time.perf_counter()-t0:.1f} s")
        t = timeit(dec)
        ok = True
        if check:
            flat = np.asarray(pd.unpack_symbols(out, S, rows))[:n]
            ok = np.array_equal(flat, arr)
        log(f"{tag}: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s  "
            f"roundtrip={'OK' if ok else 'MISMATCH'}")
        del out

    if "d512" in phases:
        data, dargs, mgw, _ = setup(512)
        dec_variant("D1 S=512 gpi=1 u=1", dargs, mgw, 512)
        dec_variant("D2 S=512 gpi=1 u=2", dargs, mgw, 512, unroll=2)
        dec_variant("D3 S=512 gpi=1 u=4", dargs, mgw, 512, unroll=4)

        if "e512" in phases:
            # encode probe knockouts on the S=512 entries (floor table)
            ent, ctot, gw = pe.prepare_entry_fused(
                data, jnp.int32(n), entry_tbl, 512, rows=rows, interpret=interp)
            jax.block_until_ready(ent)
            t_prep = timeit(lambda: pe.prepare_entry_fused(
                data, jnp.int32(n), entry_tbl, 512, rows=rows, interpret=interp)[0])
            log(f"E0 prepare_entry_fused: {t_prep*1e3:.2f} ms = "
                f"{n/t_prep/1e9:.3f} GB/s")
            gw_np2 = np.asarray(gw).astype(np.int64)
            padded = -(-gw_np2 // 128) * 128
            grow = (np.cumsum(padded) - padded) // 128
            mgw_rows = max(-(-int(-(-gw_np2.max() // 128)) // 512) * 512, 512)
            p_rows = -(-(int(grow[-1]) + mgw_rows) // 4096) * 4096
            eargs = (ent, ctot, jnp.asarray(gw_np2.astype(np.int32)),
                     jnp.asarray(grow.astype(np.int32)))
            for probe in ("", "noemit", "norank", "nobfly", "nostore",
                          "noprepend", "noemit,noprepend",
                          "norank,nobfly,nostore"):
                def enc():
                    return pe.encode_groups(*eargs, 512, pe.pick_chunk(512, rows),
                                            mgw_rows, p_rows, rows=rows,
                                            probe=probe, interpret=interp)
                t0 = time.perf_counter()
                jax.block_until_ready(enc())
                dt = time.perf_counter() - t0
                t = timeit(enc)
                log(f"E probe='{probe}': {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s "
                    f"(compile {dt:.1f} s)")
            del ent, ctot, eargs
        del data, dargs

    if "d256" in phases:
        data, dargs, mgw, _ = setup(256)
        dec_variant("D4 S=256 gpi=1 u=1", dargs, mgw, 256)
        dec_variant("D5 S=256 gpi=2 u=1", dargs, mgw, 256, gpi=2)
        dec_variant("D6 S=256 gpi=2 u=2", dargs, mgw, 256, gpi=2, unroll=2)
        del data, dargs

    if "r5b" in phases:
        # r5 shipping-path A/B on hardware: byte-LUT encode pipeline vs
        # materialized entries, bounded refill chain vs full, plus a
        # dense-branch correctness check (synchronized lanes)
        group_syms = rows * 128 * 512
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate(
            [arr, np.zeros(padded_n - n, np.uint8)]))
        for tag, probe in (("bytelut", ""), ("entrypath", "nobytelut")):
            def enc():
                p, gwv = pe.encode_payload_from_symbols(
                    data, jnp.int32(n), entry_tbl, 512, rows=rows,
                    interpret=interp, probe=probe)
                p.block_until_ready()
                return p, gwv
            t0 = time.perf_counter()
            payload, gw_np = enc()
            log(f"R5 encode[{tag}]: compile+run {time.perf_counter()-t0:.1f} s")
            t = timeit(lambda: enc()[0])
            log(f"R5 encode[{tag}]: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s")
        starts = np.cumsum(gw_np) - gw_np
        counts = np.clip(n - np.arange(gw_np.size) * group_syms, 0, group_syms)
        need = int(gw_np.max()) + rows * 128 + 256
        mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
        dargs = (payload,
                 jnp.asarray(starts.astype(np.int32)),
                 jnp.asarray(counts.astype(np.int32)),
                 jnp.asarray(cb.first_code_left_justified()),
                 jnp.asarray(cb.decode_offsets()),
                 jnp.asarray(symtab))
        for tag, probe in (("bounded", ""), ("fullchain", "nobnd")):
            def dec():
                return pd.decode_groups(*dargs, 512, cb.min_len, cb.max_len,
                                        mgw, rows=rows, probe=probe,
                                        interpret=interp)
            t0 = time.perf_counter()
            out = jax.block_until_ready(dec())
            log(f"R5 decode[{tag}]: compile+run {time.perf_counter()-t0:.1f} s")
            t = timeit(dec)
            flat = np.asarray(pd.unpack_symbols(out, 512, rows))[:n]
            ok = np.array_equal(flat, arr)
            log(f"R5 decode[{tag}]: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s  "
                f"roundtrip={'OK' if ok else 'MISMATCH'}")
            del out
        del data, dargs, payload

        # dense-branch correctness on hardware: identical lanes push k to
        # rows*128 per crossing step (the full-chain cond path)
        S2 = 512
        lanebytes = np.random.default_rng(1).choice(
            256, size=S2, p=np.random.default_rng(2).dirichlet(
                np.ones(256) * 0.2)).astype(np.uint8)
        arr2 = np.tile(lanebytes, rows * 128)
        from glz_tpu.core.codebook import build_codebook as bc
        cb2 = bc(np.bincount(arr2, minlength=256).astype(np.int64), 26)
        ent2 = jnp.asarray(cb2.left_justified_codes()
                           | cb2.lengths.astype(np.uint32))
        p2, gw2 = pe.encode_payload_from_symbols(
            jnp.asarray(arr2), jnp.int32(arr2.size), ent2, S2, rows=rows,
            interpret=interp)
        st2 = np.cumsum(gw2) - gw2
        ct2 = np.clip(arr2.size - np.arange(gw2.size) * rows * 128 * S2, 0,
                      rows * 128 * S2)
        need2 = int(gw2.max()) + rows * 128 + 256
        mgw2 = max(-(-need2 // (1 << 16)) * (1 << 16), 1 << 12)
        sy2 = np.zeros(256, np.uint32)
        sy2[: cb2.symbols.size] = cb2.symbols
        out2 = pd.decode_groups(
            p2, jnp.asarray(st2.astype(np.int32)),
            jnp.asarray(ct2.astype(np.int32)),
            jnp.asarray(cb2.first_code_left_justified()),
            jnp.asarray(cb2.decode_offsets()), jnp.asarray(sy2),
            S2, cb2.min_len, cb2.max_len, mgw2, rows=rows, interpret=interp)
        flat2 = np.asarray(pd.unpack_symbols(out2, S2, rows))[: arr2.size]
        log(f"R5 dense-branch (identical lanes): "
            f"{'OK' if np.array_equal(flat2, arr2) else 'MISMATCH'}")

    if "esub" in phases:
        # byte-LUT encode pipeline sub-phases at 512 MiB
        group_syms = rows * 128 * 512
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate(
            [arr, np.zeros(padded_n - n, np.uint8)]))
        t0 = time.perf_counter()
        sym_t = jax.block_until_ready(pe.bytes_stepmajor(data, 512, rows))
        log(f"ES transpose compile+run {time.perf_counter()-t0:.1f} s")
        t = timeit(lambda: pe.bytes_stepmajor(data, 512, rows))
        log(f"ES bytes_stepmajor: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s")
        t0 = time.perf_counter()
        ctot, gw = pe.lane_totals(sym_t, entry_tbl, jnp.int32(n), 512,
                                  pe.pick_chunk(512, rows), rows=rows,
                                  interpret=interp)
        jax.block_until_ready(ctot)
        log(f"ES lane_totals compile+run {time.perf_counter()-t0:.1f} s")
        t = timeit(lambda: pe.lane_totals(sym_t, entry_tbl, jnp.int32(n),
                                          512, pe.pick_chunk(512, rows),
                                          rows=rows, interpret=interp)[0])
        log(f"ES lane_totals: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s")
        gw_np2 = np.asarray(gw).astype(np.int64)
        padded = -(-gw_np2 // 128) * 128
        grow = (np.cumsum(padded) - padded) // 128
        mgw_rows = max(-(-int(-(-gw_np2.max() // 128)) // 512) * 512, 512)
        p_rows = -(-(int(grow[-1]) + mgw_rows) // 4096) * 4096
        def enc_kern():
            return pe.encode_groups(
                sym_t, ctot, jnp.asarray(gw_np2.astype(np.int32)),
                jnp.asarray(grow.astype(np.int32)), 512,
                pe.pick_chunk(512, rows), mgw_rows, p_rows, rows=rows,
                interpret=interp, entry_tbl=entry_tbl, n_valid=jnp.int32(n))
        t0 = time.perf_counter()
        jax.block_until_ready(enc_kern())
        log(f"ES kernel compile+run {time.perf_counter()-t0:.1f} s")
        t = timeit(lambda: jax.block_until_ready(enc_kern()))
        log(f"ES encode kernel (byte-LUT): {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s")
        del data, sym_t, ctot

    if "dbnd" in phases:
        # decode short-chain width sweep (REFILL_BND candidates)
        data, dargs, mgw, _ = setup(512)
        for probe in ("bnd8", "bnd12", "", "bnd24", "nobnd"):
            def dec():
                return pd.decode_groups(*dargs, 512, cb.min_len, cb.max_len,
                                        mgw, rows=rows, probe=probe,
                                        interpret=interp)
            t0 = time.perf_counter()
            out = jax.block_until_ready(dec())
            dt = time.perf_counter() - t0
            t = timeit(dec)
            flat = np.asarray(pd.unpack_symbols(out, 512, rows))[:n]
            ok = np.array_equal(flat, arr)
            log(f"DB probe='{probe}': {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s "
                f"rt={'OK' if ok else 'MISMATCH'} (compile {dt:.1f} s)")
            del out
        del data, dargs

    if "espec" in phases:
        # speculative geometry A/B: gw D2H sync overlapped vs serialized
        group_syms = rows * 128 * 512
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate(
            [arr, np.zeros(padded_n - n, np.uint8)]))
        freqs = sampled_histogram(arr, 8 << 20)
        spec = pe.estimate_group_rows(freqs, cb.lengths, 512, rows)
        log(f"SP estimate_group_rows: {spec}")
        for tag, sp in (("exact", 0), ("spec", spec)):
            def enc():
                p_, gwv = pe.encode_payload_from_symbols(
                    data, jnp.int32(n), entry_tbl, 512, rows=rows,
                    interpret=interp, spec_rows=sp)
                p_.block_until_ready()
                return p_, gwv
            t0 = time.perf_counter()
            payload, gw_np = enc()
            log(f"SP encode[{tag}]: compile+run {time.perf_counter()-t0:.1f} s")
            t = timeit(lambda: enc()[0])
            log(f"SP encode[{tag}]: {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s")
        # decode the speculative payload to prove layout identity on hw
        starts = np.cumsum(gw_np) - gw_np
        counts = np.clip(n - np.arange(gw_np.size) * group_syms, 0, group_syms)
        need = int(gw_np.max()) + rows * 128 + 256
        mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
        out = pd.decode_groups(
            payload, jnp.asarray(starts.astype(np.int32)),
            jnp.asarray(counts.astype(np.int32)),
            jnp.asarray(cb.first_code_left_justified()),
            jnp.asarray(cb.decode_offsets()), jnp.asarray(symtab),
            512, cb.min_len, cb.max_len, mgw, rows=rows, interpret=interp)
        flat = np.asarray(pd.unpack_symbols(out, 512, rows))[:n]
        log(f"SP roundtrip: {'OK' if np.array_equal(flat, arr) else 'MISMATCH'}")
        del data, payload, out

    if "eu" in phases:
        # emission batch width A/B (unroll 4 shipping vs 8/16)
        group_syms = rows * 128 * 512
        padded_n = -(-n // group_syms) * group_syms
        data = jnp.asarray(np.concatenate(
            [arr, np.zeros(padded_n - n, np.uint8)]))
        for probe in ("", "unroll8", "unroll16"):
            def enc():
                p, gwv = pe.encode_payload_from_symbols(
                    data, jnp.int32(n), entry_tbl, 512, rows=rows,
                    interpret=interp, probe=probe)
                p.block_until_ready()
                return p
            t0 = time.perf_counter()
            jax.block_until_ready(enc())
            dt = time.perf_counter() - t0
            t = timeit(enc)
            log(f"EU probe='{probe}': {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s "
                f"(compile {dt:.1f} s)")
        del data

    if "egap" in phases:
        egap(arr, n, rows, entry_tbl, timeit, interp, log)

    if "eb" in phases:
        # r5 batched-emission A/B + knockouts on the new encode kernel,
        # with a full round-trip check of the shipping (batched) variant
        data, dargs, mgw, _ = setup(512)  # setup uses the default path
        dec_variant("EB roundtrip", dargs, mgw, 512)
        ent, ctot, gw = pe.prepare_entry_fused(
            data, jnp.int32(n), entry_tbl, 512, rows=rows, interpret=interp)
        jax.block_until_ready(ent)
        gw_np2 = np.asarray(gw).astype(np.int64)
        padded = -(-gw_np2 // 128) * 128
        grow = (np.cumsum(padded) - padded) // 128
        mgw_rows = max(-(-int(-(-gw_np2.max() // 128)) // 512) * 512, 512)
        p_rows = -(-(int(grow[-1]) + mgw_rows) // 4096) * 4096
        eargs = (ent, ctot, jnp.asarray(gw_np2.astype(np.int32)),
                 jnp.asarray(grow.astype(np.int32)))
        for probe in ("", "noebatch", "noemit", "norank", "nobfly",
                      "nostore", "noebatch,nobfly"):
            def enc():
                return pe.encode_groups(*eargs, 512, pe.pick_chunk(512, rows),
                                        mgw_rows, p_rows, rows=rows,
                                        probe=probe, interpret=interp)
            t0 = time.perf_counter()
            jax.block_until_ready(enc())
            dt = time.perf_counter() - t0
            t = timeit(enc)
            log(f"EB probe='{probe}': {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s "
                f"(compile {dt:.1f} s)")
        del ent, ctot, eargs, data, dargs

    if "dp" in phases:
        # decode knockouts AT SCALE (the r3/r4 floor tables were 64 MiB;
        # grid-instance pipelining changes the picture at 128 groups)
        data, dargs, mgw, _ = setup(512)
        for probe in ("norank", "nogather", "noscan", "nosym", "noksum",
                      "norank,nogather,noscan,nosym,noksum"):
            def dec():
                return pd.decode_groups(*dargs, 512, cb.min_len, cb.max_len,
                                        mgw, probe=probe, rows=rows,
                                        interpret=interp)
            t0 = time.perf_counter()
            jax.block_until_ready(dec())
            dt = time.perf_counter() - t0
            t = timeit(dec)
            log(f"DP probe='{probe}': {t*1e3:.2f} ms = {n/t/1e9:.3f} GB/s "
                f"(compile {dt:.1f} s)")
        del data, dargs


def egap(arr, n, rows, entry_tbl, timeit, interp, log):
    """Where do the ~37 ms between encode kernel (65.3) and pipeline
    (102.3) go?  transpose+totals vs the gw D2H sync vs host glue."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from glz_tpu.ops import pallas_encode as pe

    group_syms = rows * 128 * 512
    padded_n = -(-n // group_syms) * group_syms
    data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))

    def prep_only():
        sym_t = pe.bytes_stepmajor(data, 512, rows)
        ctot, gw = pe.lane_totals(sym_t, entry_tbl, jnp.int32(n), 512,
                                  pe.pick_chunk(512, rows), rows=rows,
                                  interpret=interp)
        ctot.block_until_ready()
        return gw

    gw = prep_only()
    t = timeit(lambda: prep_only())
    log(f"EG transpose+lane_totals (device): {t*1e3:.2f} ms")

    def prep_sync():
        return np.asarray(prep_only())

    t = timeit(lambda: prep_sync())
    log(f"EG transpose+lane_totals+gw D2H sync: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
