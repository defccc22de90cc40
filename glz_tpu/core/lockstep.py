"""Lockstep multi-stream payload schedule ("layout 2").

The throughput decode path runs G = ROWS x 128 streams per group in lockstep
on the VPU, one symbol per stream per step.  Per-lane payload reads would be
per-lane gathers from HBM — the one operation TPUs cannot do fast.  The fix
is a payload layout in *decoder consumption order*: the encoder simulates
the decoder's word-refill schedule (which is fully determined by the
per-symbol code lengths) and emits each 32-bit word of each lane's stream at
the position the decoder will ask for it.  Decode-side payload access then
becomes strictly sequential per 128-lane row — scalar-offset slices, no
gathers.  This is the Huffman analogue of interleaved-rANS stream layouts,
and this file is the single source of truth for the schedule.

Schedule definition (per lane; c(t) = inclusive cumsum of code lengths,
c(-1) = 0):

    words_needed_after_step_t = floor((c(t-1) + 31) / 32) + 1   [t >= 1]
    mask[t]  = words_needed(t) - words_needed(t-1)  in {0, 1}
    mask[0]  = 1 if the lane has any symbols else 0

i.e. a word is loaded at the first step whose 32-bit decode window
[c(t-1), c(t-1)+32) touches it.  Loaded word j is bits [32j, 32j+32) of the
lane's own MSB-first bit stream (zero-padded).  A group of ROWS*128 lanes
shares ONE payload segment: words ordered step-major, then lane-major
(lane id = row*128 + column) within a step — a single sequential cursor
per group on the decode side.

Decoder register scheme (mirrored by the Pallas kernel): registers (a, b)
hold words j0 = floor(c(t-1)/32) and j0+1; an incoming word goes to `a`
when phase == 0 (only happens when b's slot was never needed) else to `b`;
after consuming len bits, a <- b when the word boundary is crossed.  The
32-bit window may contain garbage past the stream's last real bit; canonical
first-code comparisons only depend on the true code's top bits, so garbage
never changes a decode (see ops/decode.py notes).
"""

from __future__ import annotations

import numpy as np

# Default group geometry.  Layout-2 containers record their own group_rows
# (container header byte 7): wider groups amortize the Pallas kernels'
# per-step control/VMEM overhead (~220 cycles/iteration, PERFORMANCE.md r3)
# over more lanes — the round-4 answer to the measured decode floor.
ROWS = 8
LANES = 128
GROUP_STREAMS = ROWS * LANES


def stream_lengths_matrix(lens: np.ndarray, n_streams: int, S: int) -> np.ndarray:
    """[n_streams, S] per-lane code lengths (0-padded)."""
    out = np.zeros(n_streams * S, dtype=np.int64)
    out[: lens.size] = lens
    return out.reshape(n_streams, S)


def refill_masks(lens_mat: np.ndarray) -> np.ndarray:
    """mask[l, t] = 1 iff lane l loads a word at step t (schedule above)."""
    c = np.cumsum(lens_mat, axis=1)
    words_after = (np.concatenate([np.zeros((c.shape[0], 1), np.int64), c[:, :-1]], axis=1) + 31) // 32 + 1
    # words_after[:, t] = floor((c(t-1)+31)/32)+1 ; at t=0 -> 1
    prev = np.concatenate([np.zeros((c.shape[0], 1), np.int64), words_after[:, :-1]], axis=1)
    mask = (words_after - prev).astype(np.int64)
    mask[:, 0] = (lens_mat[:, 0] > 0).astype(np.int64)
    # lanes with zero symbols never load; lanes whose lens hit 0 mid-row stop
    return mask


def lane_words(lens_mat: np.ndarray, codes_mat: np.ndarray, lj: bool = False) -> list[np.ndarray]:
    """Per-lane v1 bit streams as u32 word arrays (MSB-first, zero pad)."""
    from glz_tpu.core import bitio

    out = []
    for l in range(lens_mat.shape[0]):
        lens = lens_mat[l]
        sel = lens > 0
        words, _ = bitio.pack_codes_msb(codes_mat[l][sel].astype(np.uint64), lens[sel].astype(np.uint64))
        out.append(words)
    return out


def reorder_payload_host(lens_mat: np.ndarray, codes_mat: np.ndarray):
    """Host-reference consumption-order payload for one group.

    Returns (payload u32 [total_words], word_count i64).
    lens_mat/codes_mat: [G, S] (lens 0 for padding), G a multiple of LANES.
    """
    assert lens_mat.shape[0] % LANES == 0
    mask = refill_masks(lens_mat)
    wl = lane_words(lens_mat, codes_mat)
    widx = np.cumsum(mask, axis=1) - 1      # word index per (lane, step)
    seg = []
    S = mask.shape[1]
    for t in range(S):
        for l in np.flatnonzero(mask[:, t]):
            j = widx[l, t]
            w = wl[l]
            seg.append(w[j] if j < w.size else np.uint32(0))
    return np.asarray(seg, dtype=np.uint32), np.int64(len(seg))


def reorder_payload_reverse_host(lens_mat: np.ndarray, lj_mat: np.ndarray):
    """Single-pass consumption-order payload via REVERSE iteration.

    Spec for the Pallas encode kernel (ops/pallas_encode.py): identical
    output to reorder_payload_host, but built in one backwards sweep with
    O(1) state per lane.  Why it works: the word the decoder loads at step
    t is word j = ceil(c(t-1)/32) and satisfies 32j >= c(t-1), i.e. all of
    its bits are produced by symbols >= t-1 — so when iterating t from S-1
    down to 0, every word is fully known by the time its (descending)
    payload position comes up, and word j's bits always sit inside the
    64-bit window [c(t), c(t)+64) held in two u32 registers per lane.

    lens_mat: [G, S] int; lj_mat: [G, S] u32 left-justified codes.
    Returns (payload u32 [total_words], total_words).
    """
    G, S = lens_mat.shape
    assert G % LANES == 0
    lens = lens_mat.astype(np.uint32)
    lj = lj_mat.astype(np.uint32)
    c_total = lens.sum(axis=1).astype(np.int64)

    # total words per lane = words_after(S-1) (refill_masks sum)
    loads = refill_masks(lens_mat.astype(np.int64)).sum(axis=1)
    T = int(loads.sum())

    w0 = np.zeros(G, np.uint32)
    w1 = np.zeros(G, np.uint32)
    cur = c_total.copy()                      # c(t) at loop entry
    payload = np.zeros(T, np.uint32)
    cursor = T

    def emit(need, word):
        nonlocal cursor
        k = int(need.sum())
        if k:
            payload[cursor - k : cursor] = word[need]
        cursor -= k

    for t in range(S - 1, -1, -1):
        ln = lens[:, t].astype(np.int64)
        cur_prev = cur - ln
        if t != S - 1:
            # load event for forward step t+1
            need = ((cur + 31) // 32) > ((cur_prev + 31) // 32)
            d = ((32 - (cur % 32)) % 32).astype(np.uint32)
            word = np.where(
                d > 0,
                (w0 << d) | (w1 >> ((np.uint32(32) - d) & np.uint32(31))),
                w0,
            ).astype(np.uint32)
            emit(need, word)
        # prepend symbol t's code.  Shift the 64-bit window (w0:w1) right by
        # ln via uint64 so ln == 32 is well-defined (uint32 >> 32 is UB in
        # NumPy and merely happens to yield 0 on some builds).
        lnu = ln.astype(np.uint64)
        nz = lnu > 0
        wide = (w0.astype(np.uint64) << np.uint64(32)) | w1.astype(np.uint64)
        shifted = wide >> lnu
        w1 = np.where(nz, shifted & np.uint64(0xFFFFFFFF), w1).astype(np.uint32)
        w0 = np.where(nz, lj[:, t] | (shifted >> np.uint64(32)).astype(np.uint32), w0).astype(np.uint32)
        cur = cur_prev
    # forward step 0: word 0 for every lane with a step-0 symbol — exactly
    # refill_masks' mask[:, 0]; equals c_total > 0 only under the
    # front-packed-lengths invariant (zeros strictly at the tail).
    emit(lens_mat[:, 0] > 0, w0)
    assert cursor == 0, cursor
    return payload, np.int64(T)


def decode_group_host(payload: np.ndarray, word_count,
                      lane_counts: np.ndarray, S: int,
                      fc_lj: np.ndarray, offsets: np.ndarray,
                      symtab: np.ndarray, min_len: int, max_len: int) -> np.ndarray:
    """Host simulator of the lockstep Pallas decoder (oracle for the kernel).

    payload: consumption-ordered u32 words (one segment per group).
    lane_counts: [G] symbols per lane (G = the group's stream count).
    offsets[l] = start_pos[l] - first_code[l] (mod 2^32).
    Returns [S, G] symbols (garbage where t >= lane_count).
    """
    G = lane_counts.shape[0]
    out = np.zeros((S, G), dtype=np.uint32)
    a = np.zeros(G, np.uint64)
    b = np.zeros(G, np.uint64)
    phase = np.zeros(G, np.uint64)
    qm = np.full(G, 31, np.uint64)
    need = lane_counts > 0
    base = 0
    for t in range(S):
        # ---- load phase: needing lanes take sequential words (lane order)
        k = int(need.sum())
        if k:
            words = payload[base : base + k]
            lanes = np.flatnonzero(need)
            to_a = phase[lanes] == 0
            a[lanes[to_a]] = words[to_a]
            b[lanes[~to_a]] = words[~to_a]
            base += k
        # ---- window
        v = np.where(phase > 0,
                     ((a << phase) | (b >> (np.uint64(32) - np.where(phase > 0, phase, np.uint64(1))))) & np.uint64(0xFFFFFFFF),
                     a & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        # ---- length scan + offset accumulate
        ln = np.full(G, min_len, np.uint64)
        off = np.full(G, offsets[min_len], np.uint64)
        for l in range(min_len, max_len):
            cond = v < np.uint64(fc_lj[l])
            ln += cond
            off = np.where(cond, np.uint64(offsets[l + 1]), off)
        active = t < lane_counts
        ln = np.where(active, ln, 0).astype(np.uint64)
        g = ((v >> (np.uint64(32) - np.where(ln > 0, ln, np.uint64(1)))) + off) & np.uint64(0xFFFFFFFF)
        sym = symtab[np.minimum(g, symtab.size - 1).astype(np.int64)]
        out[t] = np.where(active, sym, 0)
        # ---- advance
        crossed = (phase + ln) >= 32
        need = (qm + ln) >= 32
        qm = (qm + ln) & np.uint64(31)
        a = np.where(crossed, b, a)
        phase = (phase + ln) & np.uint64(31)
    return out
