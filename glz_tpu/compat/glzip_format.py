"""Reference (glzip) container interop.

Byte-level compatible reader/writers for the reference's on-disk formats so
users can exchange files with the original tool:

  * .crs2 — canonical byte format (CanonicalHuffEncoder<unsigned char>):
    big-endian u32 header {symbol_num=257, symbol_[257], min_len, max_len,
    (start_pos, first_code)[1..max_len]} then the MSB-first code stream,
    terminated by the EOF symbol (id 256) and 1-padded
    (canonical_huff_encoder.cc:211-265).
  * .crs — normal tree format (NormalHuffEncoder): preorder-serialized
    tree (internal = 0xFF,0xFF; leaf = 0x00,key), then (left_bits,
    last_byte) slot, then whole payload bytes; the final partial byte is
    zero-completed and stored in the slot (normal_huff_encoder.h:24-46,
    158-186; huff_tree.cc:174-187).

Compatibility contract: files we write decode with the reference binary and
vice versa; compressed sizes match the reference's (total payload bits are
identical for any optimal code), though code assignments may differ when
frequencies tie (the reference's tie-breaking follows std::priority_queue
internals; ours is deterministic by symbol index).
"""

from __future__ import annotations

import heapq

import numpy as np

from glz_tpu.core import bitio
from glz_tpu.core.codebook import build_codebook, canonical_codebook, histogram_bytes

EOF_SYMBOL = 256
SENTINEL = 0x7FFFFFFF  # first_code for lengths < min_len; reference uses
                       # 1024 (cc:119-121) which breaks for min_len > 10 —
                       # any value above every code works for its decoders.


# --------------------------------------------------------------------------
# .crs2 canonical byte format
# --------------------------------------------------------------------------

def write_crs2(data: bytes) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8)
    freqs = np.zeros(257, dtype=np.int64)
    freqs[:256] = histogram_bytes(arr)
    freqs[EOF_SYMBOL] = 1  # reference pins EOF frequency (encoder.h:123-129)
    cb = build_codebook(freqs, limit=32)

    header = np.zeros(1 + 257 + 2 + 2 * cb.max_len, dtype=">u4")
    header[0] = 257
    sym = np.full(257, 0xFFFFFFFF, dtype=np.uint64)
    sym[: cb.symbols.size] = cb.symbols.astype(np.uint64)
    header[1:258] = sym
    header[258] = cb.min_len
    header[259] = cb.max_len
    for l in range(1, cb.max_len + 1):
        sp = int(cb.start_pos[l]) if l >= cb.min_len else 0
        fc = int(cb.first_code[l]) if l >= cb.min_len else SENTINEL
        header[260 + 2 * (l - 1)] = sp
        header[260 + 2 * (l - 1) + 1] = fc

    codes = np.concatenate([cb.codewords[arr].astype(np.uint64),
                            [np.uint64(cb.codewords[EOF_SYMBOL])]])
    lens = np.concatenate([cb.lengths[arr].astype(np.uint64),
                           [np.uint64(cb.lengths[EOF_SYMBOL])]])
    words, total_bits = bitio.pack_codes_msb(codes, lens)
    return header.tobytes() + bitio.words_to_bytes(words, total_bits)


def read_crs2(blob: bytes) -> bytes:
    head = np.frombuffer(blob, dtype=">u4", count=260)
    symbol_num = int(head[0])
    assert symbol_num == 257, "unexpected symbol count in .crs2"
    symbols = head[1:258].astype(np.int64)
    min_len = int(head[258])
    max_len = int(head[259])
    pairs = np.frombuffer(blob, dtype=">u4", count=2 * max_len, offset=4 * 260)
    start_pos = np.zeros(max_len + 2, dtype=np.int64)
    first_code = np.zeros(max_len + 2, dtype=np.int64)
    start_pos[1 : max_len + 1] = pairs[0::2]
    first_code[1 : max_len + 1] = pairs[1::2]

    payload = blob[4 * (260 + 2 * max_len) :]

    # fast-decoder arithmetic (cc:422-461): left-justified first codes
    fc_lj = np.zeros(max_len + 2, dtype=np.uint64)
    for l in range(min_len, max_len + 1):
        fc_lj[l] = (first_code[l] << (32 - l)) & 0xFFFFFFFF

    # native fast path (growable output, .crs2 stores no original size)
    from glz_tpu.utils import native
    if native.lib() is not None:
        cap = max(4 * len(payload), 1 << 12)
        while True:
            syms_padded = np.concatenate([symbols.astype(np.int64),
                                          np.zeros(1024, np.int64)])
            out = native.decode_crs2(payload, fc_lj[: max_len + 2].astype(np.uint32),
                                     start_pos[: max_len + 2].astype(np.uint32),
                                     syms_padded, min_len, max_len, cap)
            if out is None:
                break
            if out.size < cap:
                return out.tobytes()
            cap *= 4

    words = bitio.bytes_to_words(payload).astype(np.uint64)
    padded = np.concatenate([words, np.zeros(2, np.uint64)])
    out = bytearray()
    pos = 0
    total_bits = len(payload) * 8
    while True:
        w = pos >> 5
        phase = pos & 31
        window = (int(padded[w]) << 32) | int(padded[w + 1])
        v = (window >> (32 - phase)) & 0xFFFFFFFF
        length = min_len
        while length <= max_len and v < int(fc_lj[length]):
            length += 1
        if length > max_len or pos + length > total_bits:
            raise ValueError("corrupt .crs2 stream")
        sym = int(symbols[int(start_pos[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
        if sym == EOF_SYMBOL:
            break
        out.append(sym)
        pos += length
    return bytes(out)


# --------------------------------------------------------------------------
# .crs normal tree format
# --------------------------------------------------------------------------

class _Node:
    __slots__ = ("key", "left", "right")

    def __init__(self, key=None, left=None, right=None):
        self.key = key
        self.left = left
        self.right = right

    @property
    def is_leaf(self):
        return self.left is None


def _build_tree(freqs: np.ndarray) -> _Node:
    heap = []
    counter = 0
    for i in range(256):
        if freqs[i]:
            heap.append((int(freqs[i]), counter, _Node(i)))
            counter += 1
    if not heap:
        heap.append((0, 0, _Node(0)))
        counter = 1
    if len(heap) == 1:
        # degenerate single-symbol tree: add a never-used sibling so both
        # sides can walk it (the reference crashes on this case)
        k = heap[0][2].key
        heap.append((0, counter, _Node((k + 1) % 256)))
        counter += 1
    heapq.heapify(heap)
    while len(heap) > 1:
        w1, _, n1 = heapq.heappop(heap)
        w2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (w1 + w2, counter, _Node(None, n1, n2)))
        counter += 1
    return heap[0][2]


def _serialize(node: _Node, out: bytearray) -> None:
    if node.is_leaf:
        out.append(0)
        out.append(node.key)
    else:
        out.append(255)
        out.append(255)
        _serialize(node.left, out)
        _serialize(node.right, out)


def _gen_codes(node: _Node, prefix: str, table: dict) -> None:
    if node.is_leaf:
        table[node.key] = prefix or "0"
        return
    _gen_codes(node.left, prefix + "0", table)
    _gen_codes(node.right, prefix + "1", table)


def write_crs(data: bytes) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8)
    freqs = histogram_bytes(arr)
    root = _build_tree(freqs)
    tree = bytearray()
    _serialize(root, tree)
    table: dict[int, str] = {}
    _gen_codes(root, "", table)

    codes = np.zeros(256, dtype=np.uint64)
    lens = np.zeros(256, dtype=np.uint64)
    deep = max((len(v) for v in table.values()), default=0) > 32
    if not deep:
        for k, v in table.items():
            codes[k] = int(v, 2) if v else 0
            lens[k] = len(v)
        words, total_bits = bitio.pack_codes_msb(
            codes[arr].astype(np.uint64), lens[arr].astype(np.uint64))
        stream = bitio.words_to_bytes(words, total_bits, pad_ones=False)
    else:  # >32-bit codes: slow exact path
        w = bitio.BitWriter()
        for b in arr:
            for c in table[int(b)]:
                w.write_bits(int(c), 1)
        total_bits = w._nbits + len(w._out) * 8
        w.flush_bits(0)
        stream = w.getvalue()

    left_bits = (8 - total_bits % 8) % 8
    if left_bits:
        slot = bytes([left_bits, stream[-1]])
        body = stream[:-1]
    else:
        slot = bytes([0, 0])
        body = stream
    return bytes(tree) + slot + body


def read_crs(blob: bytes) -> bytes:
    pos = 0

    def parse() -> _Node:
        nonlocal pos
        first = blob[pos]
        second = blob[pos + 1]
        pos += 2
        if first == 0:
            return _Node(second)
        node = _Node(None, None, None)
        node.left = parse()
        node.right = parse()
        return node

    root = parse()
    left_bits = blob[pos]
    last_byte = blob[pos + 1]
    pos += 2
    body = np.frombuffer(blob, dtype=np.uint8, offset=pos)

    out = bytearray()
    node = root
    bits = np.unpackbits(body)
    if left_bits:
        tail = np.unpackbits(np.asarray([last_byte], dtype=np.uint8))[: 8 - left_bits]
        bits = np.concatenate([bits, tail])
    for bit in bits:
        node = node.right if bit else node.left
        if node.is_leaf:
            out.append(node.key)
            node = root
    return bytes(out)
