"""HuffWord device-path benchmark (BASELINE config 3).

Not the driver's headline bench (that is bench.py); run manually:
    python bench_huffword.py          # GLZ_BENCH_MB (default 100)

Generates an English-like corpus (Zipf word draws + punctuation), then
times the device path phases separately:
  tokenize+vocab (host native) | entry gather (host) | Pallas encode |
  Pallas dual-codebook decode | rank map + detokenize (host native)
and prints one JSON line with the device codec GB/s (encode+decode over
original bytes) plus end-to-end numbers on stderr.  Reference hot loops
replaced: canonical_huffword.h:374-433 (encode), :615-640 (decode).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(n_bytes: int) -> bytes:
    rng = np.random.default_rng(0x3AD)
    vocab = [f"w{i:x}" for i in range(20000)]
    probs = (1.0 / np.arange(1, len(vocab) + 1)) ** 1.1
    probs /= probs.sum()
    seps = np.array([" ", " ", " ", ". ", ", ", "\n"], dtype=object)
    parts = []
    size = 0
    chunk = 1 << 16
    while size < n_bytes:
        ws = rng.choice(len(vocab), size=chunk, p=probs)
        ss = rng.choice(len(seps), size=chunk)
        s = "".join(vocab[w] + seps[k] for w, k in zip(ws, ss))
        parts.append(s.encode())
        size += len(parts[-1])
    return b"".join(parts)[:n_bytes]


def _watchdog(seconds: int):
    """Same guard as bench.py: the axon tunnel can wedge during device
    init; emit a zero result instead of hanging forever."""
    import threading

    def fire():
        log(f"WATCHDOG: no result within {seconds}s — TPU tunnel wedged?")
        print(json.dumps({"metric": "huffword_device_codec_GBps_per_chip",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}),
              flush=True)
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _subphase_profile(data, conf, word_first, wv, nv, ids, blob, n):
    """GLZ_HW_PROFILE=1: break the device-path phases into sub-steps
    (codebooks / entry gather / H2D / kernel / D2H, and the decode side)
    to locate host/transfer bottlenecks."""
    import jax
    import jax.numpy as jnp
    from glz_tpu.core import container
    from glz_tpu.core.lockstep import LANES
    from glz_tpu.models import huffword as hw
    from glz_tpu.models.canonical_byte import _round_up
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN, encode_payload_from_entries
    from glz_tpu.core.codebook import build_codebook, canonical_codebook
    from glz_tpu.utils import native
    from glz_tpu.utils import tokenizer as tok

    def tick(tag, t0):
        t1 = time.perf_counter()
        log(f"    sub[{tag}]: {(t1 - t0) * 1e3:.0f} ms")
        return t1

    T = ids.size
    S = hw._huffword_stream_tokens(conf)
    rows = container.read_container(blob).group_rows
    group_syms = rows * LANES * S
    t0 = time.perf_counter()
    limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    cbs = [build_codebook(wv.counts, limit), build_codebook(nv.counts, limit)]
    t0 = tick("codebooks", t0)
    ent_tbls = [cb.left_justified_codes() | cb.lengths.astype(np.uint32)
                for cb in cbs]
    padded_T = _round_up(max(T, 1), group_syms)
    n0 = max(wv.n, 1)
    combined = jnp.asarray(np.concatenate([ent_tbls[0], ent_tbls[1]]))
    small = max(wv.n, nv.n) <= 0xFFFF
    ids_pad = np.zeros(padded_T, np.uint16 if small else np.uint32)
    ids_pad[:T] = ids.astype(ids_pad.dtype)
    t0 = tick("pack ids (host)", t0)
    ids_d = jnp.asarray(ids_pad)
    ids_d.block_until_ready()
    t0 = tick(f"H2D ids ({ids_pad.nbytes >> 20} MiB)", t0)

    @jax.jit
    def gather_dev(x):
        pos = jnp.arange(x.shape[0], dtype=jnp.int32)
        in0 = (pos % 2 == 0) if word_first else (pos % 2 == 1)
        ent = jnp.take(combined, x.astype(jnp.int32) + jnp.where(in0, 0, n0),
                       mode="clip")
        return jnp.where(pos < T, ent, jnp.uint32(0))

    chunk = gather_dev(ids_d)
    chunk.block_until_ready()
    t0 = tick("device entry gather", t0)
    payload, group_counts = encode_payload_from_entries(chunk, S, rows=rows)
    payload.block_until_ready()
    t0 = tick("device encode kernel", t0)
    total = int(group_counts.sum())
    pay_np = np.asarray(payload[:total]).astype(np.uint32)
    t0 = tick("D2H payload", t0)

    f = container.read_container(blob)
    mv = memoryview(f.codebook_blob)
    wl, woff, wblob, off = hw._decode_dict_blob(mv, 1)
    nl, noff, nblob, off = hw._decode_dict_blob(mv, off)
    cb_even = canonical_codebook(wl if word_first else nl)
    cb_odd = canonical_codebook(nl if word_first else wl)
    group_words = f.stream_bits.astype(np.int64)
    n_groups = group_words.size
    group_starts = np.cumsum(group_words) - group_words
    group_counts2 = np.clip(T - np.arange(n_groups) * group_syms, 0, group_syms)
    need = int(group_words.max()) + rows * LANES + 2 * LANES
    mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
    t0 = time.perf_counter()
    dpay = jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32))
    dpay.block_until_ready()
    t0 = tick("H2D payload", t0)
    ranks = pd.decode_groups_dual(
        dpay, jnp.asarray(group_starts.astype(np.int32)),
        jnp.asarray(group_counts2.astype(np.int32)),
        jnp.asarray(cb_even.first_code_left_justified()),
        jnp.asarray(cb_even.decode_offsets()),
        jnp.asarray(cb_odd.first_code_left_justified()),
        jnp.asarray(cb_odd.decode_offsets()),
        S, cb_even.min_len, cb_even.max_len,
        cb_odd.min_len, cb_odd.max_len, mgw, pack2=True, rows=rows)
    ranks.block_until_ready()
    t0 = tick("device decode kernel (pack2)", t0)
    n_even = max(cb_even.symbols.size, 1)
    sym_cat = jnp.asarray(np.concatenate([cb_even.symbols, cb_odd.symbols]))

    @jax.jit
    def map_dev(r):
        flat = pd.unpack_ranks_packed(r, S, rows)
        pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
        out = jnp.take(sym_cat, flat.astype(jnp.int32)
                       + jnp.where(pos % 2 == 0, 0, n_even), mode="clip")
        return out.astype(jnp.uint16)

    mapped = map_dev(ranks)
    mapped.block_until_ready()
    t0 = tick("device unpack+rank map", t0)
    ids2 = np.asarray(mapped)[:T].astype(np.int64)
    t0 = tick(f"D2H ids ({mapped.nbytes >> 20} MiB)", t0)

    class V:
        pass
    wvv = V(); wvv.n = wl.size; wvv.offsets = woff; wvv.blob = wblob
    nvv = V(); nvv.n = nl.size; nvv.offsets = noff; nvv.blob = nblob
    out = tok.detokenize(ids2, word_first, wvv, nvv)
    t0 = tick("detokenize (host)", t0)
    assert out == data, "subphase roundtrip mismatch"


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "100"))
    n = mb << 20
    repeats = int(os.environ.get("GLZ_BENCH_REPEATS", "3"))
    _watchdog(int(os.environ.get("GLZ_BENCH_TIMEOUT", "3000")))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("GLZ_JAX_CACHE", "/tmp/glz_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e!r}")

    import jax.numpy as jnp

    from glz_tpu import config as cfg
    from glz_tpu import decompress
    from glz_tpu.core import container
    from glz_tpu.models import huffword as hw
    from glz_tpu.utils import tokenizer as tok
    from glz_tpu.utils.timer import Phase, Profiler

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    data = make_corpus(n)
    log(f"corpus gen: {time.perf_counter()-t0:.1f} s ({len(data)>>20} MiB)")

    prof = Profiler()
    conf = cfg.GlzConfig(stream_symbols=512, layout=cfg.LAYOUT_LOCKSTEP,
                         group_rows=32)

    with prof.phase("tokenize+vocab (host)", n):
        starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(data)
    T = ids.size
    log(f"tokens: {T} ({n/T:.2f} B/token), vocab {wv.n}+{nv.n}")

    def enc():
        return hw._compress_huffword_device(data, conf, word_first, wv, nv, ids)
    blob = enc()  # compile warm
    ts = [0.0] * repeats
    for i in range(repeats):
        t0 = time.perf_counter(); blob = enc(); ts[i] = time.perf_counter() - t0
    t_enc = min(ts)
    prof.phases.append(Phase("encode (entry gather + Pallas)", t_enc, n))
    f = container.read_container(blob)
    log(f"ratio: {len(blob)/n:.4f} ({len(blob)} bytes, layout {f.layout})")

    def dec():
        return decompress(blob)
    out = dec()
    assert out == data, "ROUND TRIP MISMATCH"
    for i in range(repeats):
        t0 = time.perf_counter(); dec(); ts[i] = time.perf_counter() - t0
    t_dec = min(ts)
    prof.phases.append(Phase("decode (Pallas + detokenize)", t_dec, n))
    log(prof.report())

    if os.environ.get("GLZ_HW_PROFILE"):
        _subphase_profile(data, conf, word_first, wv, nv, ids, blob, n)

    value = 2 * n / (t_enc + t_dec) / 1e9
    log(f"combined end-to-end: {value:.3f} GB/s (enc {n/t_enc/1e9:.3f} "
        f"dec {n/t_dec/1e9:.3f})")
    print(json.dumps({
        "metric": "huffword_device_codec_GBps_per_chip",
        "value": round(value, 4), "unit": "GB/s",
        "vs_baseline": round(value / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
