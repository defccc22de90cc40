"""HuffWord tokenizer — vectorized reimplementation of the reference's
streaming word/non-word splitter (utils/include/tokenizer.h).

Reference semantics preserved (tokenizer.h:118-172):
  * word chars are [0-9A-Za-z] (std::isalnum, C locale);
  * a single ' - or _ between word chars glues ("he's", "pku-online" stay
    one word, tokenizer.h:56-61); two in a row split;
  * tokens strictly alternate word / non-word;
  * word_first/word_last describe the first/last token's class.

Differences from the reference (deliberate, documented):
  * word_first_ is the class of the actually-emitted first token.  The
    reference sets it from isalnum(first char) (tokenizer.h:120), which
    mislabels files starting with a glued hyphen ("-abc" emits word "-abc"
    but word_first_=false) and would desynchronize its own decoder; we do
    not replicate that bug (SURVEY.md §7 known-bugs policy).
  * word_last is the class of the last emitted token; the reference sets
    word_last_=true whenever a word remains buffered even when a trailing
    non-word token is emitted after it (tokenizer.h:127-136), which makes
    encode_file pick the wrong end-mark dictionary for inputs ending in
    "word-" (canonical_huffword.h:411-424).

The vectorized formulation: wordlike[i] =
    isalnum[i] or (ishyphen[i] and isalnum[i+1] and (i == 0 or isalnum[i-1]))
then tokens are maximal runs of equal wordlike class — provably equivalent
to the reference's state machine on all inputs (see tests/test_tokenizer.py
which cross-checks against a literal port of the state machine).
"""

from __future__ import annotations

import numpy as np

_ALNUM = np.zeros(256, dtype=bool)
for _c in range(256):
    _ALNUM[_c] = chr(_c).isascii() and chr(_c).isalnum()
_HYPHEN = np.zeros(256, dtype=bool)
for _c in b"'-_":
    _HYPHEN[_c] = True


def wordlike_mask(data: np.ndarray) -> np.ndarray:
    """Per-byte 'belongs to a word token' mask."""
    a = _ALNUM[data]
    h = _HYPHEN[data]
    nxt = np.empty_like(a)
    nxt[:-1] = a[1:]
    nxt[-1] = False
    prv = np.empty_like(a)
    prv[1:] = a[:-1]
    prv[0] = True  # stream start counts as "ntoken empty"
    return a | (h & nxt & prv)


def tokenize(data: bytes | np.ndarray):
    """Split into alternating tokens.

    Returns (starts i64 [T], lengths i64 [T], word_first bool).
    Token i is data[starts[i] : starts[i]+lengths[i]]; classes alternate
    starting with word_first.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), False
    w = wordlike_mask(arr)
    edges = np.flatnonzero(w[1:] != w[:-1]) + 1
    starts = np.concatenate([[0], edges]).astype(np.int64)
    ends = np.concatenate([edges, [arr.size]]).astype(np.int64)
    return starts, ends - starts, bool(w[0])


class TokenVocab:
    """Token string <-> id maps for one dictionary (word or non-word).

    Ids are lexicographic ranks, making codebook construction
    deterministic (the reference depends on hash-map iteration order,
    canonical_huffword.h:191).
    """

    def __init__(self, tokens: list[bytes], counts: np.ndarray):
        self.tokens = tokens          # sorted
        self.counts = counts          # aligned with tokens
        self.index = {t: i for i, t in enumerate(tokens)}
        lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))
        self.offsets = np.concatenate([[0], np.cumsum(lens)])
        self.blob = b"".join(tokens)

    @property
    def n(self) -> int:
        return len(self.tokens)


def build_vocabs(data: bytes | np.ndarray):
    """Histogram phase (reference do_caculate_frequency(string_tag),
    encoder.h:168-203, minus the EOF pseudo-symbols — block containers
    don't need them).

    Returns (starts, lengths, word_first, word_vocab, nonword_vocab,
    token_ids) where token_ids[i] is the id of token i within its own
    class's vocab.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    starts, lengths, word_first = tokenize(arr)
    mv = arr.tobytes()
    counts: tuple[dict, dict] = ({}, {})
    toks = [None] * starts.size
    for i in range(starts.size):
        s = int(starts[i])
        t = mv[s : s + int(lengths[i])]
        toks[i] = t
        d = counts[(i & 1) ^ (0 if word_first else 1)]
        d[t] = d.get(t, 0) + 1

    vocabs = []
    for cls in range(2):
        keys = sorted(counts[cls].keys())
        cnts = np.fromiter((counts[cls][k] for k in keys), dtype=np.int64, count=len(keys))
        vocabs.append(TokenVocab(keys, cnts))

    ids = np.empty(starts.size, dtype=np.int64)
    w_idx = vocabs[0].index
    n_idx = vocabs[1].index
    for i in range(starts.size):
        is_word = (i % 2 == 0) == word_first
        ids[i] = w_idx[toks[i]] if is_word else n_idx[toks[i]]
    return starts, lengths, word_first, vocabs[0], vocabs[1], ids


def detokenize(ids: np.ndarray, word_first: bool,
               wv: TokenVocab, nv: TokenVocab) -> bytes:
    """ids -> original byte stream (vectorized gather by token)."""
    T = ids.size
    if T == 0:
        return b""
    is_word = (np.arange(T) % 2 == 0) == word_first
    wv_bytes = np.frombuffer(wv.blob, dtype=np.uint8)
    nv_bytes = np.frombuffer(nv.blob, dtype=np.uint8)
    starts = np.where(is_word, wv.offsets[:-1][np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                      nv.offsets[:-1][np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0)
    lens = np.where(is_word, np.diff(wv.offsets)[np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                    np.diff(nv.offsets)[np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0)
    total = int(lens.sum())
    out_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # expand: for each output byte, source = starts[tok] + (pos - out_off[tok])
    tok_of_byte = np.repeat(np.arange(T), lens)
    pos = np.arange(total)
    src = starts[tok_of_byte] + (pos - out_off[tok_of_byte])
    out = np.where(is_word[tok_of_byte], wv_bytes[np.minimum(src, wv_bytes.size - 1)] if wv_bytes.size else 0,
                   nv_bytes[np.minimum(src, nv_bytes.size - 1)] if nv_bytes.size else 0)
    return out.astype(np.uint8).tobytes()
