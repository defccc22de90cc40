"""Headline benchmark: canonical-byte encode+decode GB/s per chip.

Prints ONE JSON line:
  {"metric": "enwik8_byte_codec_GBps_per_chip", "value": N, "unit": "GB/s",
   "vs_baseline": N / 1.0}

The reference publishes no numbers (BASELINE.md); the committed target is
>=1 GB/s/chip combined encode+decode, so vs_baseline is the ratio to
1 GB/s.  Value = 2*bytes / (t_encode + t_decode) on device-resident data
(the chip-throughput definition; host container assembly is reported to
stderr separately).

Environment knobs: GLZ_BENCH_MB (default 100), GLZ_BENCH_STREAM (default
32768 symbols/stream), GLZ_BENCH_REPEATS (default 3).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(n_bytes: int) -> np.ndarray:
    """enwik8-like synthetic corpus: English-ish text with XML/wiki markup
    mixed in, byte entropy ~4.5-5 bits like enwik8."""
    rng = np.random.default_rng(0xE58)
    words = ("the of and to in a is that it was for on are with as his they at be this have from or one had "
             "word but not what all were we when your can said there use an each which she do how their if "
             "will up other about out many then them these so some her would make like him into time has look "
             "two more write go see number no way could people my than first water been call who oil its now "
             "find long down day did get come made may part").split()
    markup = ["<page>", "</page>", "<title>", "</title>", "[[", "]]", "{{", "}}", "&quot;", "\n", "  "]
    probs = 1.0 / np.arange(1, len(words) + 1) ** 1.1
    probs /= probs.sum()
    # build a 1 MB tile with python, then tile + shuffle word choices per MB
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
    arr = np.tile(tile, reps)[:n_bytes]
    return np.ascontiguousarray(arr)


def main():
    mb = int(os.environ.get("GLZ_BENCH_MB", "100"))
    stream_symbols = int(os.environ.get("GLZ_BENCH_STREAM", str(1 << 15)))
    repeats = int(os.environ.get("GLZ_BENCH_REPEATS", "3"))
    n = mb << 20

    import jax
    import jax.numpy as jnp
    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.ops.encode import encode_block_fast
    from glz_tpu.ops.decode import decode_block
    from glz_tpu.ops.histogram import histogram_scatter

    log(f"devices: {jax.devices()}")
    arr = make_corpus(n)
    padded_n = -(-n // stream_symbols) * stream_symbols
    data = jnp.asarray(np.concatenate([arr, np.zeros(padded_n - n, np.uint8)]))
    data.block_until_ready()
    log(f"corpus: {n} bytes, {padded_n // stream_symbols} streams of {stream_symbols}")

    # codebook (host, from device histogram)
    t0 = time.perf_counter()
    freqs = np.asarray(histogram_scatter(data)).astype(np.int64)
    freqs[0] -= padded_n - n
    cb = build_codebook(freqs)
    t_cb = time.perf_counter() - t0
    log(f"histogram+codebook: {t_cb*1e3:.1f} ms, max_len={cb.max_len}")

    lj_tbl = jnp.asarray(cb.left_justified_codes())
    len_tbl = jnp.asarray(cb.lengths.astype(np.uint32))
    table_bits = 16 if cb.max_len > 12 else 12
    lut_np = cb.decode_luts(table_bits)
    lut, fc_lj, sp, syms = (jnp.asarray(x.astype(np.uint32)) for x in lut_np)

    # ---- encode ----
    nv = jnp.int32(n)
    def enc():
        return encode_block_fast(data, nv, lj_tbl, len_tbl, stream_symbols)
    words, total_bits, stream_bits = jax.block_until_ready(enc())  # warmup/compile
    t_enc = min(_timeit(lambda: jax.block_until_ready(enc()), repeats))
    ratio = int(total_bits) / 8 / n
    log(f"encode: {n/t_enc/1e9:.3f} GB/s  ratio={ratio:.4f}")

    # ---- decode ----
    sbits = np.asarray(stream_bits).astype(np.uint64)
    starts = jnp.asarray((np.cumsum(sbits) - sbits).astype(np.uint32))
    wtrim = words  # payload stays device-resident
    def dec():
        return decode_block(wtrim, starts, lut, fc_lj, sp, syms, stream_symbols, table_bits)
    out = jax.block_until_ready(dec())
    t_dec = min(_timeit(lambda: jax.block_until_ready(dec()), repeats))
    log(f"decode: {n/t_dec/1e9:.3f} GB/s")

    # correctness spot check (bit-exact round trip on device output)
    flat = np.asarray(out).T.reshape(-1)[:n]
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


def _timeit(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


if __name__ == "__main__":
    main()
