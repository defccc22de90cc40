"""Codebook construction properties.

Mirrors the reference's (commented-out) cross-check that canonical lengths
match normal-Huffman lengths (unit_tests/test.cc:216-242), plus Kraft
equality and optimal-cost properties on random distributions.
"""

import heapq

import numpy as np
import pytest

from glz_tpu.core.codebook import (
    build_codebook,
    canonical_codebook,
    code_lengths,
    histogram_bytes,
    minimum_redundancy_lengths,
    package_merge_lengths,
)


def reference_huffman_cost(freqs):
    """Total bits of an optimal Huffman code via a plain heap (oracle)."""
    h = [f for f in freqs if f > 0]
    if len(h) <= 1:
        return len(h) * sum(h)
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a = heapq.heappop(h)
        b = heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [2, 3, 17, 256])
def test_lengths_optimal_and_kraft(seed, n):
    rng = np.random.default_rng(seed)
    freqs = np.zeros(257, dtype=np.int64)
    idx = rng.choice(257, size=n, replace=False)
    freqs[idx] = rng.integers(1, 100_000, size=n)
    lengths = minimum_redundancy_lengths(freqs)
    # optimal total cost
    assert int((freqs * lengths).sum()) == reference_huffman_cost(freqs.tolist())
    # Kraft equality (complete code) for n >= 2
    ls = lengths[lengths > 0]
    assert abs(np.sum(np.exp2(-ls.astype(np.float64))) - 1.0) < 1e-12
    # zero freq <-> zero length
    assert np.all((freqs > 0) == (lengths > 0))


def test_single_symbol():
    freqs = np.zeros(257, dtype=np.int64)
    freqs[65] = 42
    lengths = minimum_redundancy_lengths(freqs)
    assert lengths[65] == 1 and lengths.sum() == 1


def test_empty():
    assert minimum_redundancy_lengths(np.zeros(257, np.int64)).sum() == 0


@pytest.mark.parametrize("limit", [4, 8, 12])
def test_package_merge_limit(limit):
    rng = np.random.default_rng(7)
    # exponential freqs force deep codes unbounded
    freqs = np.zeros(16, dtype=np.int64)
    freqs[: 2**limit if 2**limit < 16 else 16] = 0
    n = min(16, 1 << limit)
    freqs[:n] = (2 ** np.arange(n)).astype(np.int64)
    lengths = package_merge_lengths(freqs, limit)
    ls = lengths[lengths > 0]
    assert ls.max() <= limit
    assert abs(np.sum(np.exp2(-ls.astype(np.float64))) - 1.0) < 1e-12
    # optimality among limit-bounded codes: compare against brute Huffman
    # when unbounded Huffman already fits the limit
    unb = minimum_redundancy_lengths(freqs)
    if unb.max() <= limit:
        assert int((freqs * lengths).sum()) == int((freqs * unb).sum())


def test_code_lengths_applies_limit():
    freqs = np.concatenate([(2 ** np.arange(40, dtype=np.float64)).astype(np.int64), np.zeros(217, np.int64)])
    lengths = code_lengths(freqs, limit=32)
    assert lengths.max() <= 32
    ls = lengths[lengths > 0]
    assert abs(np.sum(np.exp2(-ls.astype(np.float64))) - 1.0) < 1e-12


def test_canonical_assignment_matches_reference_scheme():
    """Canonical properties from canonical_huff_encoder.cc:69-133: codes of
    one length are consecutive from first_code[len] in symbol order; deeper
    first codes, left-justified, are numerically smaller (prefix-free)."""
    rng = np.random.default_rng(3)
    freqs = np.zeros(256, dtype=np.int64)
    freqs[:100] = rng.integers(1, 10_000, size=100)
    cb = build_codebook(freqs)
    # consecutive codes per length in symbol order
    for l in range(cb.min_len, cb.max_len + 1):
        symd = np.flatnonzero(cb.lengths == l)
        if symd.size == 0:
            continue
        cws = cb.codewords[symd]
        assert cws[0] == cb.first_code[l]
        assert np.all(np.diff(cws.astype(np.int64)) == 1)
        # bucket sort: symbols array segment matches symbol order
        seg = cb.symbols[int(cb.start_pos[l]) : int(cb.start_pos[l]) + symd.size]
        assert np.array_equal(seg, symd)
    # prefix-free: left-justified ranges don't overlap
    lj = []
    for s in np.flatnonzero(cb.lengths > 0):
        l = int(cb.lengths[s])
        start = int(cb.codewords[s]) << (32 - l)
        lj.append((start, start + (1 << (32 - l))))
    lj.sort()
    for (a0, a1), (b0, b1) in zip(lj, lj[1:]):
        assert a1 <= b0


def test_decode_luts_roundtrip_probe():
    """Every codeword, left-justified, resolves through the LUT to its own
    symbol and length."""
    rng = np.random.default_rng(11)
    freqs = np.zeros(256, dtype=np.int64)
    freqs[:200] = rng.integers(1, 1000, size=200)
    cb = build_codebook(freqs)
    lut, fc_lj, sp, syms = cb.decode_luts(table_bits=12)
    for s in np.flatnonzero(cb.lengths > 0):
        l = int(cb.lengths[s])
        v = int(cb.codewords[s]) << (32 - l)
        entry = int(lut[v >> 20])
        length = entry >> 16
        sym = entry & 0xFFFF
        if sym == 0xFFFF:
            while v < int(fc_lj[length]):
                length += 1
            sym = int(syms[int(sp[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
        assert length == l, (s, l, length)
        assert sym == s


def test_histogram_bytes():
    data = bytes([0, 0, 1, 255, 255, 255])
    h = histogram_bytes(data)
    assert h[0] == 2 and h[1] == 1 and h[255] == 3 and h.sum() == 6


def test_package_merge_fast_matches_dag():
    from glz_tpu.core.codebook import package_merge_lengths_fast
    rng = np.random.default_rng(9)
    for n, limit in [(30, 6), (200, 9), (500, 10)]:
        freqs = np.zeros(n, dtype=np.int64)
        freqs[:] = rng.integers(1, 10_000, size=n)
        slow = package_merge_lengths(freqs, limit)
        fast = package_merge_lengths_fast(freqs, limit)
        # same total cost (tie-breaking may differ)
        assert int((freqs * slow).sum()) == int((freqs * fast).sum())
        ls = fast[fast > 0]
        assert ls.max() <= limit
        assert abs(np.sum(np.exp2(-ls.astype(np.float64))) - 1.0) < 1e-9


def test_package_merge_fast_large_vocab():
    from glz_tpu.core.codebook import package_merge_lengths_fast
    rng = np.random.default_rng(10)
    n = 200_000
    freqs = (1.0 / np.arange(1, n + 1) ** 1.2 * 1e9).astype(np.int64) + 1
    lengths = package_merge_lengths_fast(freqs, 24)
    ls = lengths[lengths > 0]
    assert ls.max() <= 24
    assert abs(np.sum(np.exp2(-ls.astype(np.float64))) - 1.0) < 1e-9
    # near-optimal: within 1% of unbounded Huffman cost
    unb = minimum_redundancy_lengths(freqs)
    assert (freqs * lengths).sum() <= (freqs * unb).sum() * 1.01


def test_sampled_histogram_roundtrip_and_ratio(rng):
    """Sampled-histogram codebooks stay bit-exact on round trip and within
    1% of the exact-histogram container size (THROUGHPUT preset recipe)."""
    from glz_tpu import compress, decompress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP

    p = rng.dirichlet(np.ones(256) * 0.05)
    data = rng.choice(256, size=1 << 21, p=p).astype(np.uint8).tobytes()
    base = dict(stream_symbols=256, layout=LAYOUT_LOCKSTEP)
    exact = compress(data, conf=GlzConfig(**base))
    samp = compress(data, conf=GlzConfig(**base, histogram_budget=1 << 19))
    assert decompress(exact) == data
    assert decompress(samp) == data
    assert len(samp) <= len(exact) * 1.01


def test_sampled_histogram_smoothing_covers_unseen_symbols():
    """A symbol that appears only outside the sampled blocks still gets a
    code (+1 smoothing) — the round trip cannot break."""
    from glz_tpu import compress, decompress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core.codebook import sampled_histogram

    arr = np.full(1 << 20, ord("a"), np.uint8)
    arr[600_000] = ord("z")
    freqs = sampled_histogram(arr, 4096)
    assert freqs[ord("z")] >= 1  # smoothed in despite being unsampled
    data = arr.tobytes()
    blob = compress(data, conf=GlzConfig(stream_symbols=256,
                                         layout=LAYOUT_LOCKSTEP,
                                         histogram_budget=4096))
    assert decompress(blob) == data
