"""Headline benchmark: canonical-byte encode+decode GB/s per chip.

Prints ONE JSON line:
  {"metric": "enwik8_byte_codec_GBps_per_chip", "value": N, "unit": "GB/s",
   "vs_baseline": N / 1.0}

The reference publishes no numbers (BASELINE.md); the committed target is
>=1 GB/s/chip combined encode+decode, so vs_baseline is the ratio to
1 GB/s.  Value = 2*bytes / (t_encode + t_decode) on device-resident data
using the shipped layout-2 (lockstep) pipeline: Pallas LUT lookups + XLA
prefix-sum/scatter pack + consumption-order reorder on encode, Pallas
lockstep kernel on decode.  Codebook build (host) reported separately.

Environment knobs: GLZ_BENCH_MB (default 100), GLZ_BENCH_STREAM (default
2048 symbols/stream), GLZ_BENCH_REPEATS (default 3).
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
    """enwik8-like synthetic corpus: English-ish text with XML/wiki markup,
    byte entropy ~4.5-5 bits like enwik8."""
    rng = np.random.default_rng(0xE58)
    words = ("the of and to in a is that it was for on are with as his they at be this have from or one had "
             "word but not what all were we when your can said there use an each which she do how their if "
             "will up other about out many then them these so some her would make like him into time has look "
             "two more write go see number no way could people my than first water been call who oil its now "
             "find long down day did get come made may part").split()
    markup = ["<page>", "</page>", "<title>", "</title>", "[[", "]]", "{{", "}}", "&quot;", "\n", "  "]
    probs = 1.0 / np.arange(1, len(words) + 1) ** 1.1
    probs /= probs.sum()
    target = 1 << 20
    idx = rng.choice(len(words), size=target // 4, p=probs)
    mk = rng.random(idx.size)
    chunks = []
    size = 0
    for i, w in enumerate(idx):
        chunks.append(words[w])
        if mk[i] < 0.04:
            chunks.append(markup[int(mk[i] * 250) % len(markup)])
        chunks.append(" ")
        size += len(words[w]) + 1
        if size >= target:
            break
    tile = np.frombuffer(" ".join(chunks).encode()[:target], dtype=np.uint8)
    reps = -(-n_bytes // tile.size)
    return np.ascontiguousarray(np.tile(tile, reps)[:n_bytes])


def _timeit(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "100"))
    S = int(os.environ.get("GLZ_BENCH_STREAM", "2048"))
    repeats = int(os.environ.get("GLZ_BENCH_REPEATS", "3"))
    n = mb << 20
    wd = _watchdog(int(os.environ.get("GLZ_BENCH_TIMEOUT", "3000")))

    import jax
    import jax.numpy as jnp
    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.core.lockstep import GROUP_STREAMS, ROWS
    from glz_tpu.ops.histogram import histogram_scatter
    from glz_tpu.ops.encode import lookup_lj_lens
    from glz_tpu.ops import reorder
    from glz_tpu.ops import pallas_decode as pd

    log(f"devices: {jax.devices()}")
    arr = make_corpus(n)
    group_syms = GROUP_STREAMS * S
    padded_n = -(-n // group_syms) * group_syms
    data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))
    data.block_until_ready()
    n_groups = padded_n // group_syms
    log(f"corpus: {n} bytes, {n_groups} groups x {GROUP_STREAMS} streams x {S} symbols")

    # ---- codebook (host, from device histogram) ----
    t0 = time.perf_counter()
    freqs = np.asarray(histogram_scatter(data)).astype(np.int64)
    freqs[0] -= padded_n - n
    cb = build_codebook(freqs)
    t_cb = time.perf_counter() - t0
    log(f"histogram+codebook: {t_cb*1e3:.1f} ms, len range [{cb.min_len},{cb.max_len}]")

    lj_tbl = jnp.asarray(cb.left_justified_codes())
    len_tbl = jnp.asarray(cb.lengths.astype(np.uint32))
    nv = jnp.int32(n)
    L = padded_n // S

    # ---- encode: lut -> lane pack -> consumption-order reorder ----
    max_len = cb.max_len

    @jax.jit
    def enc(chunk, n_valid):
        lj, lens = lookup_lj_lens(chunk, n_valid, lj_tbl, len_tbl, max_len,
                                  interpret=False)
        lane_w = reorder.lane_pack_words(lj, lens, S)
        return reorder.reorder_payload_device(lens.reshape(L, S), lane_w, S)

    payload, row_counts, total = jax.block_until_ready(enc(data, nv))
    t_enc = min(_timeit(lambda: jax.block_until_ready(enc(data, nv)), repeats))
    total_words = int(total)
    ratio = total_words * 4 / n
    log(f"encode: {n/t_enc/1e9:.3f} GB/s  ratio={ratio:.4f}")

    # ---- decode: Pallas lockstep kernel ----
    gw = np.asarray(row_counts).astype(np.int64)  # words per group
    group_starts = np.cumsum(gw) - gw
    group_counts = np.clip(n - np.arange(n_groups) * group_syms, 0, group_syms)
    need = int(gw.max()) + GROUP_STREAMS + 256
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
        return pd.decode_groups(*dargs, S, cb.min_len, cb.max_len, mgw)

    out = jax.block_until_ready(dec())
    t_dec = min(_timeit(lambda: jax.block_until_ready(dec()), repeats))
    log(f"decode: {n/t_dec/1e9:.3f} GB/s")

    flat = np.asarray(pd.unpack_symbols(out, S))[:n]
    if not np.array_equal(flat, arr):
        log("ROUND TRIP MISMATCH — benchmark invalid")
        print(json.dumps({"metric": "enwik8_byte_codec_GBps_per_chip",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}))
        return

    value = 2 * n / (t_enc + t_dec) / 1e9
    log(f"combined: {value:.3f} GB/s (enc {n/t_enc/1e9:.2f} dec {n/t_dec/1e9:.2f})")
    print(json.dumps({
        "metric": "enwik8_byte_codec_GBps_per_chip",
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
