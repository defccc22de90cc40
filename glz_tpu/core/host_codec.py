"""Host (NumPy) canonical-Huffman stream codec — the correctness oracle.

Encode is fully vectorized (gather + prefix sum + two-word scatter-OR),
replacing the reference's per-byte write_bits loop
(canonical_huff_encoder.cc:270-285).  Decode implements the reference's three
strategies — bit-walk (cc:377-419), fast 32-bit window (cc:422-461) and
table-driven (cc:519-568) — as host generators, used to validate the device
decoders and for small files.  Streams are the container's unit of
parallelism: each stream covers a fixed number of input symbols and its bit
length is recorded, so device lanes can decode streams independently.
"""

from __future__ import annotations

import numpy as np

from glz_tpu.core import bitio
from glz_tpu.core.codebook import Codebook


def encode_streams(
    symbols: np.ndarray, cb: Codebook, stream_symbols: int
) -> tuple[np.ndarray, int, np.ndarray]:
    """Encode a symbol array into bit-stitched independent streams.

    Returns (payload u32 bit-words, total_bits, per-stream bit lengths).
    Stream k encodes symbols [k*S, (k+1)*S); streams are concatenated with
    no padding (stream k+1 begins at bit sum(stream_bits[:k+1])).
    """
    symbols = np.asarray(symbols)
    n = symbols.size
    lens = cb.lengths[symbols].astype(np.uint64)
    codes = cb.codewords[symbols].astype(np.uint64)
    words, total_bits = bitio.pack_codes_msb(codes, lens)
    n_streams = max(1, -(-n // stream_symbols)) if n else 1
    if n == 0:
        return words, 0, np.zeros(1, dtype=np.uint64)
    bounds = np.arange(1, n_streams) * stream_symbols
    stream_bits = np.add.reduceat(lens, np.concatenate([[0], bounds])) if n_streams > 1 else np.array([lens.sum()], dtype=np.uint64)
    return words, total_bits, stream_bits.astype(np.uint64)


def decode_stream_table(
    words: np.ndarray,
    start_bit: int,
    n_syms: int,
    lut: np.ndarray,
    fc_lj: np.ndarray,
    start_pos: np.ndarray,
    symbols: np.ndarray,
    table_bits: int,
) -> np.ndarray:
    """Table-driven decode of one stream (host oracle for the device kernel).

    Same algorithm as the reference's TableCanonicalHuffDecoder
    (cc:519-568) generalized to a (length<<16|symbol) LUT with escape to the
    cfind slow path for codes longer than table_bits.
    """
    out = np.empty(n_syms, dtype=np.int64)
    data = words.astype(np.uint64)
    padded = np.concatenate([data, np.full(2, 0, dtype=np.uint64)])
    pos = start_bit
    lut_l = lut
    shift = 32 - table_bits
    for i in range(n_syms):
        w = pos >> 5
        phase = pos & 31
        window = ((int(padded[w]) << 32) | int(padded[w + 1]))
        v = (window >> (32 - phase)) & 0xFFFFFFFF
        entry = int(lut_l[v >> shift])
        length = entry >> 16
        sym = entry & 0xFFFF
        if sym == 0xFFFF:
            while v < int(fc_lj[length]):
                length += 1
            sym = int(symbols[int(start_pos[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
        out[i] = sym
        pos += length
    return out


def decode_stream_bitwalk(
    payload: bytes, start_bit: int, n_syms: int, cb: Codebook
) -> np.ndarray:
    """Bit-at-a-time decode (reference CanonicalHuffDecoder, cc:377-419)."""
    reader = bitio.BitReader(payload, start_bit)
    out = np.empty(n_syms, dtype=np.int64)
    fc = cb.first_code
    sp = cb.start_pos
    syms = cb.symbols
    for i in range(n_syms):
        v = 0
        length = 0
        while True:
            v = (v << 1) | reader.read_bits(1)
            length += 1
            if length >= cb.min_len and length <= cb.max_len and v >= int(fc[length]):
                out[i] = syms[int(sp[length]) + v - int(fc[length])]
                break
            if length > cb.max_len:
                raise ValueError("corrupt stream: no codeword matched")
    return out


def decode_stream_fast(
    words: np.ndarray, start_bit: int, n_syms: int, cb: Codebook
) -> np.ndarray:
    """32-bit-window + cfind linear scan (reference FastCanonicalHuffDecoder,
    cc:422-461)."""
    fc_lj = cb.first_code_left_justified(32)
    out = np.empty(n_syms, dtype=np.int64)
    padded = np.concatenate([words.astype(np.uint64), np.zeros(2, dtype=np.uint64)])
    sp = cb.start_pos
    syms = cb.symbols
    pos = start_bit
    for i in range(n_syms):
        w = pos >> 5
        phase = pos & 31
        window = (int(padded[w]) << 32) | int(padded[w + 1])
        v = (window >> (32 - phase)) & 0xFFFFFFFF
        length = cb.min_len
        while v < int(fc_lj[length]):
            length += 1
        out[i] = syms[int(sp[length]) + ((v - int(fc_lj[length])) >> (32 - length))]
        pos += length
    return out


def decode_streams(
    words: np.ndarray,
    stream_bits: np.ndarray,
    n_total: int,
    stream_symbols: int,
    cb: Codebook,
    table_bits: int = 16,
    variant: str = "table",
) -> np.ndarray:
    """Decode all streams (host).  Streams are independent given their start
    offsets (exclusive prefix sum of stream_bits)."""
    if n_total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(stream_bits)[:-1]]).astype(np.int64)
    out = np.empty(n_total, dtype=np.int64)
    lut, fc_lj, sp, syms = cb.decode_luts(table_bits)
    payload_bytes = None
    for k, start in enumerate(starts):
        lo = k * stream_symbols
        hi = min(n_total, lo + stream_symbols)
        if variant == "table":
            out[lo:hi] = decode_stream_table(words, int(start), hi - lo, lut, fc_lj, sp, syms, table_bits)
        elif variant == "fast":
            out[lo:hi] = decode_stream_fast(words, int(start), hi - lo, cb)
        elif variant == "bitwalk":
            if payload_bytes is None:
                payload_bytes = bitio.words_to_bytes(words, int(words.size) * 32, pad_ones=False)
            out[lo:hi] = decode_stream_bitwalk(payload_bytes, int(start), hi - lo, cb)
        else:
            raise ValueError(f"unknown decoder variant {variant!r}")
    return out
