"""Headline benchmark: canonical-byte encode+decode GB/s per chip.

Prints ONE JSON line:
  {"metric": "enwik8_byte_codec_GBps_per_chip", "value": N, "unit": "GB/s",
   "vs_baseline": N / 1.0}

The reference publishes no numbers (BASELINE.md); the committed target is
>=1 GB/s/chip combined encode+decode, so vs_baseline is the ratio to 1 GB/s.
value = 2*bytes / (t_encode + t_decode) with the shipping lockstep pipeline:

  encode = native host histogram (threaded C++) + host codebook build
           + fused Pallas LUT/transpose + reverse-sweep Pallas encode kernel
  decode = Pallas lockstep kernel

Every jitted function is warmed before timing (min over repeats), so the
number is steady-state; compile/H2D cost is reported separately on stderr.
The corpus is non-repeating synthetic data at enwik8-like order-0 entropy
(~4.4 bits/byte: AND of three uniform byte draws — the sandbox has no
network, so real enwik8 is unfetchable), byte-entropy-matched rather than
byte-identical to the reference fixture (unit_tests/test.cc:38 uses a local
log file the repo doesn't ship either).

Environment knobs: GLZ_BENCH_MB (default 512 — fixed dispatch/sync
overheads and tunnel round trips amortize at scale), GLZ_BENCH_STREAM (default
512 symbols/stream), GLZ_BENCH_ROWS (group rows, default 64 — the r4 sweep
optimum), GLZ_BENCH_REPEATS (default 5).
"""

import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _watchdog(seconds: int):
    """The axon TPU tunnel can wedge (device init hangs forever); emit a
    zero result instead of hanging the driver."""
    def fire():
        log(f"WATCHDOG: no result within {seconds}s — TPU tunnel wedged?")
        print(json.dumps({"metric": "enwik8_byte_codec_GBps_per_chip",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}),
              flush=True)
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def make_corpus(n_bytes: int) -> np.ndarray:
    """Non-repeating corpus at enwik8-like order-0 entropy (~4.4 bits/byte):
    AND of three uniform byte draws gives p(byte) = product over bits of
    Bernoulli(1/8) — 9 probability classes, Huffman depths ~2..23 (singleton
    tail symbols deepen the tree at small GLZ_BENCH_MB)."""
    rng = np.random.default_rng(0xE58)
    out = rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    out &= rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    out &= rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    return out


def _timeit(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "512"))
    S = int(os.environ.get("GLZ_BENCH_STREAM", "512"))
    rows = int(os.environ.get("GLZ_BENCH_ROWS", "64"))
    repeats = int(os.environ.get("GLZ_BENCH_REPEATS", "5"))
    n = mb << 20
    _watchdog(int(os.environ.get("GLZ_BENCH_TIMEOUT", "3000")))

    import jax

    # persistent compilation cache: Mosaic compiles over the axon tunnel
    # take 3-15 min per kernel and vary wildly; cache them across runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("GLZ_JAX_CACHE", "/tmp/glz_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e!r}")

    import jax.numpy as jnp
    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops import pallas_encode as pe
    from glz_tpu.utils import native
    from glz_tpu.utils.timer import Phase, Profiler

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    arr = make_corpus(n)
    log(f"corpus gen: {time.perf_counter()-t0:.1f} s ({n>>20} MiB)")
    G = rows * 128
    group_syms = G * S
    padded_n = -(-n // group_syms) * group_syms
    t0 = time.perf_counter()
    data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))
    data.block_until_ready()
    log(f"H2D: {time.perf_counter()-t0:.1f} s; "
        f"{padded_n // group_syms} groups x {G} streams x {S} symbols")
    nv = jnp.int32(n)

    prof = Profiler()

    # ---- phase 1+2: histogram (host C++, threaded) + codebook (host) ----
    # Same recipe as the shipping THROUGHPUT preset: evenly-spaced-block
    # sampled histogram with +1 smoothing (round trip stays bit-exact, see
    # codebook.sampled_histogram).  GLZ_BENCH_EXACT_HIST=1 scans everything.
    # length_limit = MAX_FUSED_LEN: the fused lj|len entry word below is only
    # valid for max_len <= 26; deeper trees would silently corrupt codes.
    from glz_tpu.core.codebook import sampled_histogram
    budget = None if os.environ.get("GLZ_BENCH_EXACT_HIST") else (8 << 20)
    use_native = native.lib() is not None
    def hist_codebook():
        freqs = sampled_histogram(arr, budget)
        return build_codebook(freqs, pe.MAX_FUSED_LEN), freqs
    cb, freqs = hist_codebook()  # warm (thread pool, allocator)
    t_cb = _timeit(lambda: hist_codebook()[0], repeats)
    prof.phases.append(Phase(
        f"histogram+codebook ({'C++' if use_native else 'numpy'}"
        f"{', sampled' if budget else ''})", t_cb, n))
    log(f"histogram+codebook: {t_cb*1e3:.1f} ms, len range [{cb.min_len},{cb.max_len}]")

    assert cb.max_len <= pe.MAX_FUSED_LEN, (
        f"max_len {cb.max_len} exceeds the fused-entry limit {pe.MAX_FUSED_LEN}")
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))

    # ---- phase 3: device encode (byte-LUT pipeline + reverse sweep) ----
    # speculative geometry: the gw D2H sync overlaps the kernel; an exact
    # re-run covers a missed histogram estimate (pallas_encode._launch)
    spec = pe.estimate_group_rows(freqs, cb.lengths, S, rows)

    def enc():
        payload, padded = pe.encode_payload_from_symbols(data, nv, entry_tbl,
                                                         S, rows=rows,
                                                         spec_rows=spec)
        payload.block_until_ready()
        return payload, padded
    t0 = time.perf_counter()
    payload, gw_np = enc()
    log(f"encode compile+run: {time.perf_counter()-t0:.1f} s")
    t_enc_dev = _timeit(lambda: enc(), repeats)
    prof.phases.append(Phase("device encode (Pallas)", t_enc_dev, n))
    ratio = gw_np.sum() * 4 / n
    t_enc = t_cb + t_enc_dev
    log(f"encode: {n/t_enc/1e9:.3f} GB/s (device {n/t_enc_dev/1e9:.3f})  ratio={ratio:.4f}")

    # ---- phase 4: decode (Pallas lockstep kernel) ----
    n_groups = gw_np.size
    group_starts = np.cumsum(gw_np) - gw_np
    group_counts = np.clip(n - np.arange(n_groups) * group_syms, 0, group_syms)
    need = int(gw_np.max()) + G + 256
    mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    dargs = (payload,
             jnp.asarray(group_starts.astype(np.int32)),
             jnp.asarray(group_counts.astype(np.int32)),
             jnp.asarray(cb.first_code_left_justified()),
             jnp.asarray(cb.decode_offsets()),
             jnp.asarray(symtab))

    def dec():
        return pd.decode_groups(*dargs, S, cb.min_len, cb.max_len, mgw,
                                rows=rows)

    t0 = time.perf_counter()
    out = jax.block_until_ready(dec())
    log(f"decode compile+run: {time.perf_counter()-t0:.1f} s")
    t_dec = _timeit(lambda: jax.block_until_ready(dec()), repeats)
    prof.phases.append(Phase("device decode (Pallas)", t_dec, n))
    log(f"decode: {n/t_dec/1e9:.3f} GB/s")
    log(prof.report())

    # optional jax.profiler trace of one steady-state encode+decode pass
    trace_dir = os.environ.get("GLZ_BENCH_TRACE")
    if trace_dir:
        from glz_tpu.utils.timer import device_trace
        with device_trace(trace_dir):
            enc()
            jax.block_until_ready(dec())
        log(f"profiler trace written to {trace_dir}")

    flat = np.asarray(pd.unpack_symbols(out, S, rows))[:n]
    if not np.array_equal(flat, arr):
        log("ROUND TRIP MISMATCH — benchmark invalid")
        print(json.dumps({"metric": "enwik8_byte_codec_GBps_per_chip",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}))
        return

    # ---- real-chip edge cases: Mosaic lowering bugs bite on compiled
    # hardware, not in the interpret-mode CI (r2 weak #10).  Shapes reuse
    # the headline run's compiled encode kernel via the min_* floors.
    edges_ok = True
    if os.environ.get("GLZ_BENCH_EDGES", "1") != "0":
        mgw_rows_main = -(-int(gw_np.max()) // 128)
        mgw_rows_main = max(-(-mgw_rows_main // 512) * 512, 512)
        padded_main = -(-gw_np // 128) * 128
        p_rows_main = int((padded_main.sum() - padded_main[-1]) // 128) + mgw_rows_main
        p_rows_main = -(-p_rows_main // 4096) * 4096
        floors = dict(min_mgw_rows=mgw_rows_main, min_p_rows=p_rows_main)

        def edge_roundtrip(tag, arr_e, n_valid):
            t0 = time.perf_counter()
            cb_e = build_codebook(sampled_histogram(arr_e[:n_valid], budget),
                                  pe.MAX_FUSED_LEN)
            ent_e = jnp.asarray(cb_e.left_justified_codes()
                                | cb_e.lengths.astype(np.uint32))
            de = jnp.asarray(arr_e)
            pay_e, gw_e = pe.encode_payload_from_symbols(
                de, jnp.int32(n_valid), ent_e, S, rows=rows, **floors)
            ng = gw_e.size
            st_e = np.cumsum(gw_e) - gw_e
            ct_e = np.clip(n_valid - np.arange(ng) * group_syms, 0, group_syms)
            sy_e = np.zeros(256, np.uint32)
            sy_e[: cb_e.symbols.size] = cb_e.symbols
            # this corpus's own window size: a deep-codebook group can
            # exceed the headline run's mgw, and an undersized window
            # silently truncates the DMA (spurious MISMATCH).  Flooring at
            # the headline mgw reuses its compiled kernel when possible.
            need_e = int(gw_e.max()) + G + 256
            mgw_e = max(-(-need_e // (1 << 16)) * (1 << 16), mgw)
            out_e = pd.decode_groups(
                pay_e, jnp.asarray(st_e.astype(np.int32)),
                jnp.asarray(ct_e.astype(np.int32)),
                jnp.asarray(cb_e.first_code_left_justified()),
                jnp.asarray(cb_e.decode_offsets()), jnp.asarray(sy_e),
                S, cb_e.min_len, cb_e.max_len, mgw_e, rows=rows)
            got = np.asarray(pd.unpack_symbols(out_e, S, rows))[:n_valid]
            ok = np.array_equal(got, np.asarray(arr_e)[:n_valid])
            log(f"edge[{tag}]: len range [{cb_e.min_len},{cb_e.max_len}], "
                f"{time.perf_counter()-t0:.1f} s — {'OK' if ok else 'MISMATCH'}")
            return ok

        # (a) ragged tail: same padded geometry, short final group/stream
        edges_ok &= edge_roundtrip("ragged", np.asarray(data), n - 123457)
        # (b) deep codebook: geometric frequencies push the natural tree
        # past 26 bits; package-merge caps at MAX_FUSED_LEN exactly
        rng = np.random.default_rng(0xDEEB)
        deep = (np.minimum(rng.geometric(0.5, size=padded_n), 64) - 1
                ).astype(np.uint8)
        edges_ok &= edge_roundtrip("deepcode", deep, n)
        if not edges_ok:
            log("EDGE CASE MISMATCH — benchmark invalid")
            print(json.dumps({"metric": "enwik8_byte_codec_GBps_per_chip",
                              "value": 0.0, "unit": "GB/s",
                              "vs_baseline": 0.0}))
            return

    value = 2 * n / (t_enc + t_dec) / 1e9
    log(f"combined: {value:.3f} GB/s (enc {n/t_enc/1e9:.2f} dec {n/t_dec/1e9:.2f})")

    # ---- BASELINE config 3: HuffWord device pass, machine-recorded next to
    # the byte metric (r3 review missing #2).  Same kernels family, so the
    # Mosaic compiles are ~1 s each at this point in the process.
    result = {
        "metric": "enwik8_byte_codec_GBps_per_chip",
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / 1.0, 4),
    }
    if os.environ.get("GLZ_BENCH_HW", "1") != "0":
        try:
            hw = _bench_huffword(
                int(os.environ.get("GLZ_BENCH_HW_MB", str(min(mb, 100)))),
                min(repeats, 3))  # transfer-bound: ~10 s/pass
            result.update(hw)
        except Exception as e:
            log(f"huffword bench FAILED: {e!r}")
            result["huffword_GBps"] = 0.0
    if os.environ.get("GLZ_BENCH_BATCH", "1") != "0":
        try:
            # transfer-bound (~30 s/pass at 512 MiB): 2 repeats suffice
            result.update(_bench_batch(arr, S, rows, min(repeats, 2)))
        except Exception as e:
            log(f"batch bench FAILED: {e!r}")
    print(json.dumps(result))


def _bench_batch(arr, S: int, rows: int, repeats: int) -> dict:
    """BASELINE config 4 shape: a 4-file batch through compress_batch AND
    decompress_batch (r4 review next #7 — the decode half was previously
    asserted by symmetry, not measured), serial loop vs the 2-deep
    host/device pipeline (file i+1's host phases overlap file i's device
    kernels).  Also logs the shared-codebook archive's total-size win."""
    from glz_tpu import config as cfg
    from glz_tpu.core.api import compress_archive, compress_batch, decompress_batch

    n4 = arr.size // 4
    files = [arr[i * n4 : (i + 1) * n4].tobytes() for i in range(4)]
    total = 4 * n4
    conf = cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP,
                         histogram_budget=8 << 20, group_rows=rows)
    blobs = compress_batch(files, conf=conf)  # warm (compile the batch shapes)
    t_ser = _timeit(lambda: compress_batch(files, conf=conf, pipeline=False),
                    repeats)
    t_pipe = _timeit(lambda: compress_batch(files, conf=conf), repeats)
    log(f"batch4 encode: serial {total/t_ser/1e9:.3f} GB/s, "
        f"pipelined {total/t_pipe/1e9:.3f} GB/s "
        f"({t_ser/t_pipe:.2f}x)")
    got = decompress_batch(blobs)  # warm + verify
    if [g for g in got] != files:
        log("BATCH DECODE MISMATCH")
        return {"batch4_serial_GBps": 0.0}
    t_dser = _timeit(lambda: decompress_batch(blobs, pipeline=False), repeats)
    t_dpipe = _timeit(lambda: decompress_batch(blobs), repeats)
    log(f"batch4 decode: serial {total/t_dser/1e9:.3f} GB/s, "
        f"pipelined {total/t_dpipe/1e9:.3f} GB/s ({t_dser/t_dpipe:.2f}x)")
    # archive vs per-file containers with the SAME shared codebook: the
    # apples-to-apples header-duplication saving (own-codebook containers
    # trade header bytes for per-file-optimal payloads; byte-mode codebooks
    # are only 129 B, huffword vocab blobs are where archives win big)
    shared = compress_batch(files, conf=conf, shared_codebook=True)
    arc = compress_archive(files, conf=conf)
    per_total = sum(len(b) for b in shared)
    log(f"batch4 shared-codebook archive: {len(arc)} B vs per-file "
        f"{per_total} B ({per_total - len(arc)} B saved)")
    return {"batch4_serial_GBps": round(total / t_ser / 1e9, 4),
            "batch4_pipelined_GBps": round(total / t_pipe / 1e9, 4),
            "batch4_dec_serial_GBps": round(total / t_dser / 1e9, 4),
            "batch4_dec_pipelined_GBps": round(total / t_dpipe / 1e9, 4)}


def _bench_huffword(mb: int, repeats: int) -> dict:
    """HuffWord device codec GB/s (BASELINE config 3): Zipf English-like
    corpus, device codec = entry gather + reverse-sweep encode, dual-codebook
    lockstep decode + detokenize.  t_enc excludes the tokenize/vocab phase
    (reported separately) — the same split bench_huffword.py uses.

    huffword_kernel_GBps is the DEVICE-RESIDENT codec number (r4 review
    next #3): token ids pre-staged on device, encode = entry gather +
    reverse-sweep kernel, decode = dual lockstep kernel + rank->id map,
    no host<->device payload/id transfers in the timed region.  On the
    axon tunnel (~10-30 MB/s links) the e2e huffword_GBps is transfer-
    bound; the kernel number is what a device-resident pipeline (decode
    feeding a TPU consumer) sees."""
    import time

    from bench_huffword import make_corpus as hw_corpus
    from glz_tpu import config as cfg
    from glz_tpu import decompress
    from glz_tpu.models import huffword as hwm
    from glz_tpu.utils import tokenizer as tok

    n = mb << 20
    t0 = time.perf_counter()
    data = hw_corpus(n)
    log(f"huffword corpus gen: {time.perf_counter()-t0:.1f} s ({mb} MiB)")
    conf = cfg.GlzConfig(stream_symbols=512, layout=cfg.LAYOUT_LOCKSTEP,
                         group_rows=32)

    t0 = time.perf_counter()
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(data)
    t_tok = time.perf_counter() - t0
    log(f"huffword tokenize+vocab: {t_tok:.2f} s "
        f"({ids.size} tokens, vocab {wv.n}+{nv.n})")

    def enc():
        return hwm._compress_huffword_device(data, conf, word_first, wv, nv, ids)

    blob = enc()  # warm/compile
    t_enc = _timeit(lambda: enc(), repeats)
    out = decompress(blob)
    if out != data:
        log("HUFFWORD ROUND TRIP MISMATCH")
        return {"huffword_GBps": 0.0}
    t_dec = _timeit(lambda: decompress(blob), repeats)
    value = 2 * n / (t_enc + t_dec) / 1e9
    log(f"huffword: ratio {len(blob)/n:.4f}; enc {n/t_enc/1e9:.3f} GB/s, "
        f"dec(+detok) {n/t_dec/1e9:.3f} GB/s, combined {value:.3f} GB/s; "
        f"end-to-end incl. tokenize "
        f"{2*n/(t_tok+t_enc+t_dec)/1e9:.3f} GB/s")
    result = {"huffword_GBps": round(value, 4),
              "huffword_tokenize_s": round(t_tok, 3),
              "huffword_e2e_GBps": round(2 * n / (t_tok + t_enc + t_dec) / 1e9, 4)}
    try:
        result.update(_bench_huffword_kernels(
            n, blob, word_first, wv, nv, ids, conf, repeats))
    except Exception as e:
        log(f"huffword kernel bench FAILED: {e!r}")
    return result


def _bench_huffword_kernels(n, blob, word_first, wv, nv, ids, conf,
                            repeats) -> dict:
    """Device-resident huffword codec timing (ids staged once, kernels
    timed alone).  Mirrors models/huffword's device paths minus transfers."""
    import jax
    import jax.numpy as jnp

    from glz_tpu import config as cfg
    from glz_tpu.core import container
    from glz_tpu.core.codebook import build_codebook, canonical_codebook
    from glz_tpu.models import huffword as hwm
    from glz_tpu.models.canonical_byte import _round_up
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops import pallas_encode as pe

    T = ids.size
    S = hwm._huffword_stream_tokens(conf)
    small = max(wv.n, nv.n) <= 0xFFFF
    rows = min(conf.group_rows, hwm.huffword_rows_cap(S, small))
    group_syms = rows * 128 * S
    limit = min(conf.length_limit or pe.MAX_FUSED_LEN, pe.MAX_FUSED_LEN)
    cbs = [build_codebook(wv.counts, limit), build_codebook(nv.counts, limit)]

    # ---- stage encode inputs on device once
    padded_T = _round_up(max(T, 1), group_syms)
    ids_pad = np.zeros(padded_T, np.uint16 if small else np.uint32)
    ids_pad[:T] = ids.astype(ids_pad.dtype)
    ids_d = jax.block_until_ready(jnp.asarray(ids_pad))
    ent_tbls = [cb.left_justified_codes() | cb.lengths.astype(np.uint32)
                for cb in cbs]
    tbl_d = jnp.asarray(np.concatenate(ent_tbls))
    n0 = jnp.int32(max(wv.n, 1))

    interpret = jax.default_backend() == "cpu"

    def enc_kernel():
        chunk = hwm._gather_entries_device(ids_d, tbl_d, jnp.int32(0), n0,
                                           jnp.int32(T),
                                           even_is_dict0=bool(word_first))
        payload, gc = pe.encode_payload_from_entries(chunk, S, rows=rows,
                                                     interpret=interpret)
        payload.block_until_ready()
        return payload, gc

    enc_kernel()  # warm
    t_enc_k = _timeit(lambda: enc_kernel(), repeats)

    # ---- stage decode inputs on device once (from the real container)
    f = container.read_container(blob)
    cb_even, cb_odd = (cbs[0], cbs[1]) if word_first else (cbs[1], cbs[0])
    G = rows * 128
    gw = f.stream_bits.astype(np.int64)
    group_starts = np.cumsum(gw) - gw
    group_counts = np.clip(T - np.arange(gw.size) * G * S, 0, G * S)
    need = int(gw.max()) + G + 2 * 128
    mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
    payload_d = jax.block_until_ready(
        jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32)))
    st_d = jnp.asarray(group_starts.astype(np.int32))
    ct_d = jnp.asarray(group_counts.astype(np.int32))
    fc_e = jnp.asarray(cb_even.first_code_left_justified())
    of_e = jnp.asarray(cb_even.decode_offsets())
    fc_o = jnp.asarray(cb_odd.first_code_left_justified())
    of_o = jnp.asarray(cb_odd.decode_offsets())
    n_even = max(cb_even.symbols.size, 1)
    sym_cat = jnp.asarray(np.concatenate(
        [cb_even.symbols if cb_even.symbols.size else np.zeros(1, np.uint32),
         cb_odd.symbols if cb_odd.symbols.size else np.zeros(1, np.uint32)]))

    def dec_kernel():
        ranks = pd.decode_groups_dual(
            payload_d, st_d, ct_d, fc_e, of_e, fc_o, of_o,
            S, cb_even.min_len, cb_even.max_len,
            cb_odd.min_len, cb_odd.max_len, mgw, pack2=small, rows=rows,
            interpret=interpret)
        ids2 = hwm._map_ranks_device(ranks, sym_cat, jnp.int32(n_even),
                                     S=S, small=small, rows=rows)
        ids2.block_until_ready()
        return ids2

    ids2 = dec_kernel()  # warm + oracle: kernel path must reproduce the ids
    if not np.array_equal(np.asarray(ids2)[:T].astype(np.int64),
                          ids.astype(np.int64)):
        log("HUFFWORD KERNEL ROUND TRIP MISMATCH")
        return {"huffword_kernel_GBps": 0.0}
    t_dec_k = _timeit(lambda: dec_kernel(), repeats)
    kernel_v = 2 * n / (t_enc_k + t_dec_k) / 1e9
    log(f"huffword kernel-only (device-resident): enc {n/t_enc_k/1e9:.3f} "
        f"GB/s, dec {n/t_dec_k/1e9:.3f} GB/s, combined {kernel_v:.3f} GB/s")
    return {"huffword_kernel_GBps": round(kernel_v, 4),
            "huffword_kernel_enc_GBps": round(n / t_enc_k / 1e9, 4),
            "huffword_kernel_dec_GBps": round(n / t_dec_k / 1e9, 4)}


if __name__ == "__main__":
    main()
