"""Vectorized MSB-first bit packing/unpacking (host).

The reference writes bit streams one bit at a time through a byte
accumulator (Buffer::write_bit, buffer.h:241-248) and reads them through a
64-bit left-justified window (BitBuffer::read_bits, buffer.h:384-436).  Both
are inherently serial.  Here packing is a vectorized prefix-sum + two-word
scatter-OR, and the same bit-stream convention is kept: MSB-first within a
byte, codes emitted most-significant-bit first, final partial byte padded
with 1s (reference flush_bits, buffer.h:277-281).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_U32 = np.uint32


def pack_codes_msb(codes: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, int]:
    """Pack per-symbol codes (right-justified values, bit length in lens)
    into an MSB-first bit stream.

    Returns (u32 word array in big-endian bit order, total_bits).  Word w
    covers stream bits [32w, 32w+32), most significant bit first; serialize
    with words.astype('>u4').tobytes().
    """
    codes = np.asarray(codes, dtype=np.uint64)
    lens = np.asarray(lens, dtype=np.uint64)
    if codes.size == 0:
        return np.zeros(0, dtype=_U32), 0
    ends = np.cumsum(lens, dtype=np.uint64)
    total_bits = int(ends[-1])
    offsets = ends - lens
    n_words = (total_bits + 31) >> 5

    lj = (codes << (_U64(32) - lens)) & _U64(0xFFFFFFFF)  # left-justified in 32
    phase = offsets & _U64(31)
    lo_idx = (offsets >> _U64(5)).astype(np.int64)
    lo_val = (lj >> phase).astype(_U32)
    hi_val = ((lj << (_U64(32) - phase)) & _U64(0xFFFFFFFF)).astype(_U32)
    # phase == 0 -> shift by 32 is UB; mask it out
    hi_val = np.where(phase == 0, _U32(0), hi_val)

    words = np.zeros(n_words + 1, dtype=_U32)
    np.bitwise_or.at(words, lo_idx, lo_val)
    np.bitwise_or.at(words, lo_idx + 1, hi_val)
    return words[:n_words], total_bits


def words_to_bytes(words: np.ndarray, total_bits: int, pad_ones: bool = True) -> bytes:
    """Serialize u32 bit-words to bytes; pad the final partial byte with 1s
    (matching reference flush_bits) unless pad_ones=False (zero padding)."""
    n_bytes = (total_bits + 7) >> 3
    raw = bytearray(words.astype(">u4").tobytes()[:n_bytes])
    rem = total_bits & 7
    if rem and n_bytes:
        mask = (1 << (8 - rem)) - 1
        if pad_ones:
            raw[-1] |= mask
        else:
            raw[-1] &= ~mask & 0xFF
    return bytes(raw)


def bytes_to_words(data: bytes | np.ndarray) -> np.ndarray:
    """Byte stream -> u32 big-endian bit words (zero-padded tail)."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    pad = (-arr.size) % 4
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return arr.view(">u4").astype(_U32)


def extract_bits(words: np.ndarray, bit_offsets: np.ndarray, n_bits: int = 32) -> np.ndarray:
    """Vectorized read of `n_bits` (<=32) starting at each bit offset,
    returned left-justified in 32 bits.  Offsets may be arbitrary."""
    words64 = words.astype(_U64)
    padded = np.concatenate([words64, np.zeros(2, dtype=_U64)])
    off = np.asarray(bit_offsets, dtype=np.uint64)
    w = (off >> _U64(5)).astype(np.int64)
    phase = off & _U64(31)
    window = (padded[w] << _U64(32)) | padded[w + 1]
    out = (window >> (_U64(32) - phase)) & _U64(0xFFFFFFFF)
    if n_bits < 32:
        out = out & ~((_U64(1) << _U64(32 - n_bits)) - _U64(1))
    return out.astype(_U32)


class BitWriter:
    """Sequential MSB-first bit writer (host compat paths: reference
    container formats).  Mirrors Buffer's bit facilities (buffer.h:241-295).
    """

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write_bits(self, code: int, n: int) -> None:
        self._acc = (self._acc << n) | (code & ((1 << n) - 1))
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def left_bits(self) -> int:
        return (8 - self._nbits) % 8

    def flush_bits(self, pad_bit: int = 1) -> None:
        while self._nbits:
            self.write_bits(pad_bit, 1)

    def write_bytes(self, b: bytes) -> None:
        assert self._nbits == 0
        self._out.extend(b)

    def getvalue(self) -> bytes:
        return bytes(self._out)


class BitReader:
    """Sequential MSB-first bit reader with a 64-bit window (reference
    BitBuffer, buffer.h:382-436)."""

    def __init__(self, data: bytes, bit_offset: int = 0) -> None:
        self._data = data
        self._pos = bit_offset

    def read_bits(self, n: int) -> int:
        out = 0
        pos = self._pos
        data = self._data
        for _ in range(n):
            byte = data[pos >> 3] if (pos >> 3) < len(data) else 0xFF
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self._pos = pos
        return out

    @property
    def bit_pos(self) -> int:
        return self._pos
