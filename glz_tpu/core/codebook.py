"""Canonical Huffman codebook construction.

Replaces the reference's two heap-simulation length algorithms — the
index-array heap with parent-group relinking for bytes
(canonical_huff_encoder.cc:290-345) and the in-place pointer heap for words
(canonical_huffword.h:459-525) — with the sorted-frequency Moffat–Katajainen
in-place algorithm plus an optional package-merge length limiter, followed by
the same canonical code assignment the reference derives
(canonical_huff_encoder.cc:69-133):

    first_code[max_len] = 0
    first_code[l]       = (first_code[l+1] + num[l+1]) / 2      # MG book
    codeword[sym]       = next_code[len(sym)]++   in symbol order
    symbol[start_pos[len]++] = sym                # bucket sort by length

i.e. deeper codes are numerically smaller, codes are MSB-first, and a decoder
needs only {symbol order, start_pos, first_code, min/max len}.  Total payload
size is identical to the reference's for the same histogram (any optimal
Huffman code has the same cost), and the construction is deterministic here
(ties broken by symbol index) where the reference's depends on
std::priority_queue internals.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_CODE_LEN = 32  # reference contract: lengths <= 32 (canonical_huff_encoder.h:43)


def histogram_bytes(data: np.ndarray | bytes) -> np.ndarray:
    """256-bin byte histogram (host path; native threaded C++ when built).

    Device path: glz_tpu.ops.histogram.  Reference equivalent: the 64 KB
    fread loop at encoder.h:136-150.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    if arr.size >= (1 << 20):
        from glz_tpu.utils import native
        h = native.histogram(arr)
        if h is not None:
            return h
    return np.bincount(arr, minlength=256).astype(np.int64)


SAMPLE_BLOCK = 4096


def sampled_histogram(arr: np.ndarray, budget_bytes: int | None) -> np.ndarray:
    """Histogram estimate from evenly spaced 4 KiB blocks, scaled to the
    full size and smoothed so every byte value keeps a code.

    The returned counts feed codebook construction only — any histogram
    yields a VALID code (round trips are bit-exact regardless); sampling
    trades <~0.1% compression ratio on stationary inputs for an O(budget)
    instead of O(n) scan, the standard dictionary-builder move (zstd
    samples too).  budget None or >= n means exact."""
    n = arr.size
    if budget_bytes is None or n <= budget_bytes:
        return histogram_bytes(arr)
    nb = n // SAMPLE_BLOCK
    take = max(1, budget_bytes // SAMPLE_BLOCK)
    stride = max(1, nb // take)
    sample = np.ascontiguousarray(
        arr[: nb * SAMPLE_BLOCK].reshape(nb, SAMPLE_BLOCK)[::stride]).reshape(-1)
    freqs = histogram_bytes(sample)
    scale = max(1, n // sample.size)
    # +1 smoothing: a symbol missing from the sample but present in the
    # file must still get a code (it lands at the deepest length)
    return np.maximum(freqs * scale, 1)


def minimum_redundancy_lengths(freqs: np.ndarray) -> np.ndarray:
    """Optimal (unbounded) Huffman code lengths via Moffat–Katajainen.

    In-place over frequencies sorted ascending; O(n) after the sort.  Zero
    frequencies get length 0 (absent symbol).  Ties are broken by symbol
    index so results are deterministic.
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    n_sym = freqs.shape[0]
    present = np.flatnonzero(freqs > 0)
    n = present.size
    lengths = np.zeros(n_sym, dtype=np.int32)
    if n == 0:
        return lengths
    if n == 1:
        lengths[present[0]] = 1
        return lengths

    order = present[np.argsort(freqs[present], kind="stable")]
    a = freqs[order].astype(np.int64).tolist()

    # Phase 1: tree building; a[i] becomes parent index for internal nodes.
    a[0] += a[1]
    root = 0
    leaf = 2
    for nxt in range(1, n - 1):
        if leaf >= n or a[root] < a[leaf]:
            a[nxt] = a[root]
            a[root] = nxt
            root += 1
        else:
            a[nxt] = a[leaf]
            leaf += 1
        if leaf >= n or (root < nxt and a[root] < a[leaf]):
            a[nxt] += a[root]
            a[root] = nxt
            root += 1
        else:
            a[nxt] += a[leaf]
            leaf += 1

    # Phase 2: internal node depths.
    a[n - 2] = 0
    for nxt in range(n - 3, -1, -1):
        a[nxt] = a[a[nxt]] + 1

    # Phase 3: leaf depths from internal depths.
    avail = 1
    used = 0
    depth = 0
    root = n - 2
    nxt = n - 1
    while avail > 0:
        while root >= 0 and a[root] == depth:
            used += 1
            root -= 1
        while avail > used:
            a[nxt] = depth
            nxt -= 1
            avail -= 1
        avail = 2 * used
        depth += 1
        used = 0

    # a[i] is now the depth of the i-th largest... a is leaf depths in
    # non-increasing order aligned with ascending-frequency order reversed:
    # a[0..n-1] holds depths for the sorted symbols (ascending freq ->
    # non-increasing depth).
    lengths[order] = np.asarray(a, dtype=np.int32)
    return lengths


def package_merge_lengths(freqs: np.ndarray, limit: int) -> np.ndarray:
    """Length-limited code lengths via boundary package-merge.

    Used when the unbounded lengths exceed `limit` (the reference has no
    limiter and simply assumes <=32).  O(n * limit).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    n_sym = freqs.shape[0]
    present = np.flatnonzero(freqs > 0)
    n = present.size
    lengths = np.zeros(n_sym, dtype=np.int32)
    if n == 0:
        return lengths
    if n == 1:
        lengths[present[0]] = 1
        return lengths
    if n > (1 << limit):
        raise ValueError(f"cannot code {n} symbols with length limit {limit}")

    order = present[np.argsort(freqs[present], kind="stable")]
    w = freqs[order].astype(np.float64)

    # Package-merge: maintain, per level from depth=limit up to 1, a sorted
    # list of (weight, leaf_count_vector) packages.  We track per-package
    # how many of the original leaves it contains at each depth implicitly by
    # counting leaf usage: standard trick — count, for each symbol, in how
    # many selected packages of the top level it appears == its code length.
    # Implementation: each package is (weight, coverage) with coverage a
    # count array; to stay O(n*limit) memory-light we carry per-package the
    # number of leaves with index < k... simplest robust version: coverage as
    # leaf-index boundary is wrong for merges, so carry explicit per-symbol
    # counts via summed "leaf multiset" using index lists would be O(n^2).
    # Standard solution: run level by level, remembering for each level the
    # packages as (weight, is_leaf, left_child, right_child) and walk the
    # DAG at the end.  n<=2^20 and limit<=32 keeps this cheap.
    leaves = [(float(w[i]), -1, i) for i in range(n)]  # (weight, -1, leaf idx)
    nodes: list[tuple[float, int, int]] = []  # (weight, childA, childB) indices into pool
    pool: list[tuple[float, int, int, int]] = []  # (weight, leaf_idx|-1, childA, childB)

    def leaf_pkg(i: int) -> int:
        pool.append((float(w[i]), i, -1, -1))
        return len(pool) - 1

    prev_level: list[int] = []
    for _level in range(limit):
        merged: list[int] = []
        # packages from prev level, paired
        pairs = [(prev_level[2 * i], prev_level[2 * i + 1]) for i in range(len(prev_level) // 2)]
        pi = 0
        li = 0
        while li < n or pi < len(pairs):
            take_pair = False
            if pi < len(pairs):
                pw = pool[pairs[pi][0]][0] + pool[pairs[pi][1]][0]
                if li >= n or pw < w[li]:
                    take_pair = True
            if take_pair:
                a_, b_ = pairs[pi]
                pool.append((pool[a_][0] + pool[b_][0], -1, a_, b_))
                merged.append(len(pool) - 1)
                pi += 1
            else:
                merged.append(leaf_pkg(li))
                li += 1
        prev_level = merged

    # Select the first 2n-2 packages of the final level; count leaf coverage.
    counts = np.zeros(n, dtype=np.int32)
    stack = list(prev_level[: 2 * n - 2])
    while stack:
        idx = stack.pop()
        wt, leaf, a_, b_ = pool[idx]
        if leaf >= 0:
            counts[leaf] += 1
        else:
            stack.append(a_)
            stack.append(b_)
    lengths[order] = counts
    return lengths


def package_merge_lengths_fast(freqs: np.ndarray, limit: int) -> np.ndarray:
    """Vectorized boundary package-merge (large alphabets, e.g. HuffWord
    vocabularies).  Uses the prefix property of boundary PM: the selected
    items of each level form a prefix, so per-symbol lengths are
    sum_k [position_of_leaf_in_level_k < selected_k], all computable with
    sorts/searchsorted.  Ties among equal weights may resolve differently
    from the DAG reference, but total cost is identical (tested)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    n_sym = freqs.shape[0]
    present = np.flatnonzero(freqs > 0)
    n = present.size
    lengths = np.zeros(n_sym, dtype=np.int32)
    if n == 0:
        return lengths
    if n == 1:
        lengths[present[0]] = 1
        return lengths
    if n > (1 << limit):
        raise ValueError(f"cannot code {n} symbols with length limit {limit}")

    order = present[np.argsort(freqs[present], kind="stable")]
    leaf_w = freqs[order].astype(np.float64)

    # build levels top-down: level L = leaves; level k-1 = merge(leaves,
    # pairs(level k)); record leaf positions per level
    leafpos_levels = []
    merged_w = leaf_w.copy()
    leafpos_levels.append(np.arange(n, dtype=np.int64))
    for _ in range(limit - 1):
        m = merged_w.shape[0]
        pair_w = merged_w[: m - (m % 2)].reshape(-1, 2).sum(axis=1)
        # leaf precedes equal-weight packages
        leafpos = np.arange(n) + np.searchsorted(pair_w, leaf_w, side="left")
        merged_w = np.sort(np.concatenate([leaf_w, pair_w]), kind="stable")
        leafpos_levels.append(leafpos)
    # leafpos_levels[k] corresponds to level (limit - k); level 1 is last.

    counts = np.zeros(n, dtype=np.int32)
    sel = 2 * n - 2
    for k in range(limit - 1, -1, -1):
        leafpos = leafpos_levels[k]
        n_leaves_sel = int(np.searchsorted(leafpos, sel, side="left"))
        counts[:n_leaves_sel] += 1
        n_packages = sel - n_leaves_sel
        sel = 2 * n_packages
        if sel == 0:
            break
    lengths[order] = counts
    return lengths


def code_lengths(freqs: np.ndarray, limit: int | None = MAX_CODE_LEN) -> np.ndarray:
    """Huffman code lengths, limited to `limit` if necessary."""
    lengths = minimum_redundancy_lengths(freqs)
    if limit is not None and lengths.max(initial=0) > limit:
        n = int((np.asarray(freqs) > 0).sum())
        pm = package_merge_lengths_fast if n > 2048 else package_merge_lengths
        lengths = pm(freqs, limit)
    return lengths


@dataclasses.dataclass
class Codebook:
    """Canonical codebook in the reference's scheme (cc:69-133).

    lengths[sym]   : code length, 0 = absent
    codewords[sym] : right-justified code value
    first_code[l]  : numerically smallest code of length l (index 0..max_len;
                     sentinel for l < min_len so decode comparisons fail,
                     reference uses 1024 at cc:119-121)
    start_pos[l]   : index into `symbols` of the first symbol of length l
    symbols        : symbol indices bucket-sorted by (length, symbol)
    """

    lengths: np.ndarray
    codewords: np.ndarray
    first_code: np.ndarray
    start_pos: np.ndarray
    symbols: np.ndarray
    min_len: int
    max_len: int

    @property
    def n_symbols(self) -> int:
        return int(self.lengths.shape[0])

    def total_bits(self, freqs: np.ndarray) -> int:
        return int((np.asarray(freqs, dtype=np.int64) * self.lengths).sum())

    def kraft_sum(self) -> float:
        ls = self.lengths[self.lengths > 0]
        return float(np.sum(np.exp2(-ls.astype(np.float64))))

    def left_justified_codes(self) -> np.ndarray:
        """codeword << (32 - length) per symbol (0 for absent symbols) —
        the encoder-side table for MSB-first packing."""
        sh = (32 - np.maximum(self.lengths, 1)).astype(np.uint64)
        lj = (self.codewords.astype(np.uint64) << sh).astype(np.uint32)
        return np.where(self.lengths > 0, lj, 0).astype(np.uint32)

    # ---- decode tables -------------------------------------------------
    def first_code_left_justified(self, width: int = 32) -> np.ndarray:
        """first_code << (width - l) — the fast decoder's form (cc:437-438).

        Sentinels chosen so the branch-free cfind
        `len = start + sum_l [v < fc[l]]` terminates correctly:
        0xFFFFFFFF for l < min_len (never matches, reference uses 1024 at
        cc:119-121) and 0 for l > max_len (always matches, stops the scan).
        """
        fc = np.full(MAX_CODE_LEN + 2, 0xFFFFFFFF, dtype=np.uint64)
        fc[self.max_len + 1 :] = 0
        for l in range(self.min_len, self.max_len + 1):
            fc[l] = (np.uint64(self.first_code[l]) << np.uint64(width - l)) & np.uint64(0xFFFFFFFF)
        return fc[: MAX_CODE_LEN + 2].astype(np.uint32)

    def decode_offsets(self) -> np.ndarray:
        """offsets[l] = (start_pos[l] - first_code[l]) mod 2^32, the fused
        symbol-index table for gather-light decoders:
        symbol_index = (v >> (32-len)) + offsets[len]   (mod 2^32)
        equals the reference's start_pos[len] + ((v - fc_lj[len]) >> (32-len))
        (canonical_huff_encoder.cc:456)."""
        out = np.zeros(MAX_CODE_LEN + 2, dtype=np.uint32)
        for l in range(self.min_len, self.max_len + 1):
            out[l] = np.uint32((int(self.start_pos[l]) - int(self.first_code[l])) & 0xFFFFFFFF)
        return out

    def decode_luts(self, table_bits: int = 16):
        """(lut, fc_lj, start_pos, symbols) for table-driven decode.

        lut[idx] packs (length << 16) | symbol for codes of length <=
        table_bits, generalising the reference's 8-bit length-only LUT
        (cc:466-516) to also resolve the symbol in the same probe.  Entries
        whose true length exceeds table_bits store (length_lower_bound << 16)
        with symbol 0xFFFF, sending the decoder to the reference's slow path
        (cc:558-562).
        """
        size = 1 << table_bits
        lut = np.zeros(size, dtype=np.uint32)
        fc_lj = self.first_code_left_justified(32)
        sp = self.start_pos
        syms = self.symbols
        for l in range(self.min_len, self.max_len + 1):
            n_l = int(self.start_pos[l + 1] - self.start_pos[l]) if l + 1 < len(self.start_pos) else 0
            if n_l == 0:
                continue
            first = int(self.first_code[l])
            if l <= table_bits:
                # each code of length l owns 2^(table_bits-l) consecutive slots
                span = 1 << (table_bits - l)
                for k in range(n_l):
                    code = first + k
                    sym = int(syms[sp[l] + k])
                    if sym >= 0xFFFF:  # id too wide to embed -> escape path
                        sym = 0xFFFF
                    base = code << (table_bits - l)
                    lut[base : base + span] = (np.uint32(l) << 16) | np.uint32(sym)
            else:
                # mark the slot range covered by length-l codes with the
                # escape tag; decoder falls back to cfind from table_bits+1
                lo = (first << (32 - l)) >> (32 - table_bits)
                hi_code = first + n_l - 1
                hi = (hi_code << (32 - l)) >> (32 - table_bits)
                mask = lut[lo : hi + 1] == 0
                lut[lo : hi + 1] = np.where(mask, (np.uint32(l) << 16) | np.uint32(0xFFFF), lut[lo : hi + 1])
        return lut, fc_lj, sp.astype(np.uint32), syms.astype(np.uint32)


def canonical_codebook(lengths: np.ndarray) -> Codebook:
    """Assign canonical codes from lengths, reference semantics (cc:69-133)."""
    lengths = np.asarray(lengths, dtype=np.int32)
    n_sym = lengths.shape[0]
    max_len = int(lengths.max(initial=0))
    if max_len == 0:
        return Codebook(lengths, np.zeros(n_sym, np.uint32),
                        np.zeros(2, np.uint32), np.zeros(2, np.uint32),
                        np.zeros(0, np.int32), 0, 0)
    if max_len > MAX_CODE_LEN:
        raise ValueError(f"code length {max_len} exceeds {MAX_CODE_LEN}")

    num = np.bincount(lengths, minlength=max_len + 2).astype(np.int64)
    num[0] = 0
    nonzero = np.flatnonzero(num)
    min_len = int(nonzero[0])

    # start_pos[l] = number of symbols with length < l
    start_pos = np.zeros(max_len + 2, dtype=np.int64)
    start_pos[1:] = np.cumsum(num[: max_len + 1])

    # first_code recurrence, top-down (deeper codes numerically smaller)
    first_code = np.zeros(max_len + 1, dtype=np.int64)
    for l in range(max_len - 1, 0, -1):
        first_code[l] = (first_code[l + 1] + num[l + 1]) // 2

    # canonical: codeword = first_code[len] + rank of symbol within length
    order = np.arange(n_sym)
    # rank within each length bucket in symbol order
    codewords = np.zeros(n_sym, dtype=np.uint32)
    symbols_sorted = np.full(int(num.sum()), -1, dtype=np.int32)
    next_code = first_code.copy()
    fill = start_pos.copy()
    present = np.flatnonzero(lengths > 0)
    # vectorized rank computation: sort present symbols by (length, symbol)
    sort_idx = present[np.lexsort((present, lengths[present]))]
    ls = lengths[sort_idx]
    # position within its length bucket:
    bucket_start = start_pos[ls]
    pos_in_sorted = np.arange(sort_idx.size)
    rank = pos_in_sorted - bucket_start
    codewords[sort_idx] = (first_code[ls] + rank).astype(np.uint32)
    symbols_sorted[pos_in_sorted] = sort_idx.astype(np.int32)

    # sentinel for l < min_len (reference cc:119-121 uses 1024; we use a
    # value guaranteed above any l-bit code)
    fc_out = first_code.astype(np.uint32)
    for l in range(1, min_len):
        fc_out[l] = np.uint32(1 << 31)

    return Codebook(
        lengths=lengths,
        codewords=codewords,
        first_code=fc_out,
        start_pos=start_pos.astype(np.uint32),
        symbols=symbols_sorted,
        min_len=min_len,
        max_len=max_len,
    )


def build_codebook(freqs: np.ndarray, limit: int | None = MAX_CODE_LEN) -> Codebook:
    return canonical_codebook(code_lengths(freqs, limit))
