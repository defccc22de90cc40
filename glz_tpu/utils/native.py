"""ctypes bindings for the native host library (native/glz_native.cpp).

Loads (building on demand) the C++ fast paths; every entry point has a pure
NumPy/Python fallback, so the framework works without a compiler — but with
one, host encode/decode run at native speed (the reference's whole codec is
host C++; this is our equivalent runtime layer).
"""

from __future__ import annotations

import ctypes
import pathlib
import sys

import numpy as np

_LIB = None
_TRIED = False


def lib():
    """The loaded native library or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        root = pathlib.Path(__file__).resolve().parents[2]
        sys.path.insert(0, str(root / "native"))
        import build as _build  # native/build.py
        path = _build.build()
        if path is None:
            return None
        L = ctypes.CDLL(str(path))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.glz_histogram.argtypes = [u8p, ctypes.c_size_t, i64p]
        L.glz_encode_bytes.restype = ctypes.c_uint64
        L.glz_encode_bytes.argtypes = [u8p, ctypes.c_uint64, u32p, u8p,
                                       ctypes.c_uint64, u64p, u8p]
        L.glz_decode_streams.argtypes = [u8p, ctypes.c_uint64, u64p,
                                         ctypes.c_uint64, ctypes.c_uint64,
                                         ctypes.c_uint64, u32p, ctypes.c_uint32,
                                         u32p, u32p, u32p, u8p]
        L.glz_tokenize.restype = ctypes.c_uint64
        L.glz_tokenize.argtypes = [u8p, ctypes.c_uint64, u64p, u8p]
        L.glz_encode_tokens.restype = ctypes.c_uint64
        L.glz_encode_tokens.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32,
                                        u32p, u8p, u32p, u8p,
                                        ctypes.c_uint64, u64p, u8p]
        L.glz_decode_tokens.argtypes = [u8p, ctypes.c_uint64, u64p,
                                        ctypes.c_uint64, ctypes.c_uint64,
                                        ctypes.c_uint64, ctypes.c_uint32,
                                        u32p, u32p, u32p, ctypes.c_uint32,
                                        u32p, u32p, u32p, ctypes.c_uint32, u32p]
        L.glz_decode_crs2.restype = ctypes.c_uint64
        L.glz_decode_crs2.argtypes = [u8p, ctypes.c_uint64, u32p, u32p,
                                      i64p, ctypes.c_uint32, ctypes.c_uint32,
                                      u8p, ctypes.c_uint64]
        L.glz_detokenize.restype = ctypes.c_uint64
        L.glz_detokenize.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32,
                                     u64p, u8p, u64p, u8p, u8p]
        L.glz_build_vocab.restype = ctypes.c_uint64
        L.glz_build_vocab.argtypes = [u8p, u64p, ctypes.c_uint64,
                                      ctypes.c_uint32, ctypes.c_uint64,
                                      u32p, u32p, u64p, u8p, u64p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.glz_gather_entries.restype = None
        L.glz_gather_entries.argtypes = [u32p, ctypes.c_uint64,
                                         ctypes.c_uint32, u32p, u32p, u32p]
        L.glz_map_ranks.restype = None
        L.glz_map_ranks.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32,
                                    i32p, ctypes.c_uint64,
                                    i32p, ctypes.c_uint64, u32p]
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def histogram(data: np.ndarray, threads: int | None = None) -> np.ndarray | None:
    """256-bin byte histogram; shards across CPU threads for large inputs
    (the ctypes call releases the GIL, so threads scale on real cores)."""
    import os

    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.size
    if threads is None:
        threads = min(os.cpu_count() or 1, max(1, n >> 24))
    if threads <= 1:
        out = np.zeros(256, dtype=np.int64)
        L.glz_histogram(_p(data, ctypes.c_uint8), n, _p(out, ctypes.c_int64))
        return out
    from concurrent.futures import ThreadPoolExecutor

    outs = np.zeros((threads, 256), dtype=np.int64)
    bounds = [n * i // threads for i in range(threads + 1)]

    def work(i):
        chunk = data[bounds[i] : bounds[i + 1]]
        L.glz_histogram(_p(chunk, ctypes.c_uint8), chunk.size,
                        _p(outs[i], ctypes.c_int64))

    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(work, range(threads)))
    return outs.sum(axis=0)


def encode_bytes(data: np.ndarray, lj: np.ndarray, lens: np.ndarray,
                 stream_symbols: int):
    """Returns (payload bytes, total_bits, stream_bits u64[]) or None."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    lj = np.ascontiguousarray(lj, dtype=np.uint32)
    lens8 = np.ascontiguousarray(lens, dtype=np.uint8)
    n = data.size
    n_streams = max(1, -(-n // stream_symbols))
    out = np.zeros(4 * n + 16, dtype=np.uint8)
    sbits = np.zeros(n_streams, dtype=np.uint64)
    total_bits = L.glz_encode_bytes(
        _p(data, ctypes.c_uint8), n, _p(lj, ctypes.c_uint32),
        _p(lens8, ctypes.c_uint8), stream_symbols,
        _p(sbits, ctypes.c_uint64), _p(out, ctypes.c_uint8))
    n_bytes = (int(total_bits) + 7) >> 3
    return out[:n_bytes].tobytes(), int(total_bits), sbits


def decode_streams(payload: bytes, stream_bits: np.ndarray, n_total: int,
                   stream_symbols: int, lut: np.ndarray, table_bits: int,
                   fc_lj: np.ndarray, start_pos: np.ndarray,
                   symbols: np.ndarray) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    pay = np.frombuffer(payload, dtype=np.uint8)
    pay = np.ascontiguousarray(pay)
    sbits = np.ascontiguousarray(stream_bits, dtype=np.uint64)
    lut = np.ascontiguousarray(lut, dtype=np.uint32)
    fc = np.ascontiguousarray(fc_lj, dtype=np.uint32)
    sp = np.ascontiguousarray(start_pos, dtype=np.uint32)
    syms = np.ascontiguousarray(symbols, dtype=np.uint32)
    out = np.zeros(n_total, dtype=np.uint8)
    L.glz_decode_streams(
        _p(pay, ctypes.c_uint8), pay.size, _p(sbits, ctypes.c_uint64),
        sbits.size, stream_symbols, n_total, _p(lut, ctypes.c_uint32),
        table_bits, _p(fc, ctypes.c_uint32), _p(sp, ctypes.c_uint32),
        _p(syms, ctypes.c_uint32), _p(out, ctypes.c_uint8))
    return out


def encode_tokens(ids: np.ndarray, phase0: int,
                  lj0: np.ndarray, len0: np.ndarray,
                  lj1: np.ndarray, len1: np.ndarray,
                  stream_tokens: int):
    """Dual-dictionary token encode; returns (payload, total_bits, stream_bits)."""
    L = lib()
    if L is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.uint32)
    n = ids.size
    n_streams = max(1, -(-n // stream_tokens))
    out = np.zeros(4 * n + 16, dtype=np.uint8)
    sbits = np.zeros(n_streams, dtype=np.uint64)
    a = lambda x, t: np.ascontiguousarray(x, dtype=t)
    total = L.glz_encode_tokens(
        _p(ids, ctypes.c_uint32), n, phase0,
        _p(a(lj0, np.uint32), ctypes.c_uint32), _p(a(len0, np.uint8), ctypes.c_uint8),
        _p(a(lj1, np.uint32), ctypes.c_uint32), _p(a(len1, np.uint8), ctypes.c_uint8),
        stream_tokens, _p(sbits, ctypes.c_uint64), _p(out, ctypes.c_uint8))
    n_bytes = (int(total) + 7) >> 3
    return out[:n_bytes].tobytes(), int(total), sbits


def decode_tokens(payload: bytes, stream_bits: np.ndarray, n_total: int,
                  stream_tokens: int, phase0: int, dicts) -> np.ndarray | None:
    """dicts: two tuples (fc_lj u32[34], offsets u32[34], symbols u32[],
    min_len)."""
    L = lib()
    if L is None:
        return None
    pay = np.ascontiguousarray(np.frombuffer(payload, dtype=np.uint8))
    sbits = np.ascontiguousarray(stream_bits, dtype=np.uint64)
    out = np.zeros(n_total, dtype=np.uint32)
    a = lambda x: np.ascontiguousarray(x, dtype=np.uint32)
    (fc0, off0, sym0, min0), (fc1, off1, sym1, min1) = dicts
    L.glz_decode_tokens(
        _p(pay, ctypes.c_uint8), pay.size, _p(sbits, ctypes.c_uint64),
        sbits.size, stream_tokens, n_total, phase0,
        _p(a(fc0), ctypes.c_uint32), _p(a(off0), ctypes.c_uint32),
        _p(a(sym0), ctypes.c_uint32), min0,
        _p(a(fc1), ctypes.c_uint32), _p(a(off1), ctypes.c_uint32),
        _p(a(sym1), ctypes.c_uint32), min1,
        _p(out, ctypes.c_uint32))
    return out


def decode_crs2(payload: bytes, fc_lj: np.ndarray, start_pos: np.ndarray,
                symbols: np.ndarray, min_len: int, max_len: int,
                out_cap: int) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    pay = np.ascontiguousarray(np.frombuffer(payload, dtype=np.uint8))
    out = np.zeros(out_cap, dtype=np.uint8)
    n = L.glz_decode_crs2(
        _p(pay, ctypes.c_uint8), pay.size,
        _p(np.ascontiguousarray(fc_lj, np.uint32), ctypes.c_uint32),
        _p(np.ascontiguousarray(start_pos, np.uint32), ctypes.c_uint32),
        _p(np.ascontiguousarray(symbols, np.int64), ctypes.c_int64),
        min_len, max_len, _p(out, ctypes.c_uint8), out_cap)
    return out[: int(n)]


def detokenize(ids: np.ndarray, first_dict: int,
               off0: np.ndarray, blob0: bytes,
               off1: np.ndarray, blob1: bytes) -> bytes | None:
    """Token ids -> original bytes via per-token memcpy (dict = parity ^
    first_dict).  Returns None without the native library."""
    L = lib()
    if L is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.uint32)
    o0 = np.ascontiguousarray(off0, dtype=np.uint64)
    o1 = np.ascontiguousarray(off1, dtype=np.uint64)
    b0 = np.ascontiguousarray(np.frombuffer(blob0 or b"\0", dtype=np.uint8))
    b1 = np.ascontiguousarray(np.frombuffer(blob1 or b"\0", dtype=np.uint8))
    T = ids.size
    # per-token output lengths in one vectorized pass: gives both the
    # total and the split offset without any native dry-run passes
    d0 = np.diff(o0.astype(np.int64)) if o0.size > 1 else np.zeros(1, np.int64)
    d1 = np.diff(o1.astype(np.int64)) if o1.size > 1 else np.zeros(1, np.int64)
    par = (np.arange(T, dtype=np.int64) & 1) ^ first_dict
    lens = np.where(par == 0,
                    d0[np.minimum(ids, max(d0.size - 1, 0))],
                    d1[np.minimum(ids, max(d1.size - 1, 0))])
    total = int(lens.sum())
    out = np.empty(total, dtype=np.uint8)
    if T >= (1 << 20):
        # split the memcpy pass across 2 threads (ctypes releases the GIL);
        # mid is even so the parity -> dictionary mapping is unchanged
        import concurrent.futures

        mid = (T // 2) & ~1
        half0 = int(lens[:mid].sum())

        def run(lo, cnt, off):
            L.glz_detokenize(_p(ids[lo : lo + cnt], ctypes.c_uint32), cnt,
                             first_dict,
                             _p(o0, ctypes.c_uint64), _p(b0, ctypes.c_uint8),
                             _p(o1, ctypes.c_uint64), _p(b1, ctypes.c_uint8),
                             _p(out[off:], ctypes.c_uint8))

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(run, 0, mid, 0)
            f2 = ex.submit(run, mid, T - mid, half0)
            f1.result(), f2.result()
    else:
        L.glz_detokenize(_p(ids, ctypes.c_uint32), T, first_dict,
                         _p(o0, ctypes.c_uint64), _p(b0, ctypes.c_uint8),
                         _p(o1, ctypes.c_uint64), _p(b1, ctypes.c_uint8),
                         _p(out, ctypes.c_uint8))
    return out.tobytes()


def build_vocab(arr: np.ndarray, bounds: np.ndarray, T: int, cls: int,
                ids: np.ndarray, cap_tokens: int = 1 << 22):
    """One class's vocabulary: writes ids in place for this class's token
    positions; returns (blob bytes, tok_lens i64[V], counts i64[V]) in
    (length, content) rank order.  Returns None without the library.

    Buffers are np.empty at a modest default capacity (only V entries are
    ever touched; a V > cap_tokens vocabulary triggers one retry at the
    exact size)."""
    L = lib()
    if L is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.uint64)
    while True:
        tok_lens = np.empty(max(cap_tokens, 1), np.uint32)
        counts = np.empty(max(cap_tokens, 1), np.uint64)
        blob = np.empty(max(arr.size, 1), np.uint8)
        blob_len = np.zeros(1, np.uint64)
        V = int(L.glz_build_vocab(
            _p(arr, ctypes.c_uint8), _p(bounds, ctypes.c_uint64), T, cls,
            cap_tokens, _p(ids, ctypes.c_uint32), _p(tok_lens, ctypes.c_uint32),
            _p(counts, ctypes.c_uint64), _p(blob, ctypes.c_uint8),
            _p(blob_len, ctypes.c_uint64)))
        if V <= cap_tokens:
            return (blob[: int(blob_len[0])].tobytes(),
                    tok_lens[:V].astype(np.int64), counts[:V].astype(np.int64))
        cap_tokens = V


def gather_entries(ids: np.ndarray, flip: int, tbl0: np.ndarray,
                   tbl1: np.ndarray, out: np.ndarray) -> bool:
    """out[i] = tbl[(i & 1) ^ flip][ids[i]] for i < ids.size (out may be
    longer; the tail is left untouched).  Returns False without the lib."""
    L = lib()
    if L is None:
        return False
    ids = np.ascontiguousarray(ids, dtype=np.uint32)
    L.glz_gather_entries(
        _p(ids, ctypes.c_uint32), ids.size, flip,
        _p(np.ascontiguousarray(tbl0, np.uint32), ctypes.c_uint32),
        _p(np.ascontiguousarray(tbl1, np.uint32), ctypes.c_uint32),
        _p(out, ctypes.c_uint32))
    return True


def map_ranks(ranks: np.ndarray, flip: int, sym0: np.ndarray,
              sym1: np.ndarray) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    ranks = np.ascontiguousarray(ranks, dtype=np.uint32)
    s0 = np.ascontiguousarray(sym0, np.int32)
    s1 = np.ascontiguousarray(sym1, np.int32)
    out = np.empty(ranks.size, np.uint32)
    L.glz_map_ranks(_p(ranks, ctypes.c_uint32), ranks.size, flip,
                    _p(s0, ctypes.c_int32), s0.size,
                    _p(s1, ctypes.c_int32), s1.size,
                    _p(out, ctypes.c_uint32))
    return out


def tokenize(data: np.ndarray):
    """Returns (bounds u64[T+1], first_is_word) or None."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    bounds = np.zeros(data.size + 1, dtype=np.uint64)
    first = np.zeros(1, dtype=np.uint8)
    t = L.glz_tokenize(_p(data, ctypes.c_uint8), data.size,
                       _p(bounds, ctypes.c_uint64), _p(first, ctypes.c_uint8))
    return bounds[: int(t) + 1], bool(first[0])
