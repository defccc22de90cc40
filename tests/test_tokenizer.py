"""Tokenizer: vectorized splitter vs a literal port of the reference state
machine (tokenizer.h:118-172)."""

import numpy as np
import pytest

from glz_tpu.utils import tokenizer as tok


def reference_state_machine(data: bytes):
    """Literal behavioral port of Tokenizer::split/do_split — the oracle."""
    def isalnum(c):
        return chr(c).isascii() and chr(c).isalnum()

    def ishypen(c):
        return c in b"'-_"

    tokens = []  # (is_word, bytes)
    wtoken = bytearray()
    ntoken = bytearray()
    for c in data:
        if isalnum(c):
            if ntoken:
                if len(ntoken) == 1 and ishypen(ntoken[0]):
                    wtoken += ntoken
                    ntoken.clear()
                else:
                    tokens.append((False, bytes(ntoken)))
                    ntoken.clear()
            wtoken.append(c)
        else:
            if wtoken and not (ishypen(c) and not ntoken):
                tokens.append((True, bytes(wtoken)))
                wtoken.clear()
            ntoken.append(c)
    if wtoken:
        tokens.append((True, bytes(wtoken)))
    if ntoken:
        tokens.append((False, bytes(ntoken)))
    return tokens


CASES = [
    b"hello world",
    b"he's a pku-online test_case",
    b"a--b",
    b"-abc starts with hyphen",
    b"ends with hyphen-",
    b"a-'b mixed",
    b" -a leading space",
    b"",
    b"-",
    b"''",
    b"a",
    b" \t\n ",
    b"x1y2z3 42 -- _x_ 'q'",
]


@pytest.mark.parametrize("data", CASES)
def test_matches_reference_state_machine(data):
    ref = reference_state_machine(data)
    starts, lengths, word_first = tok.tokenize(data)
    got = []
    for i in range(starts.size):
        is_word = (i % 2 == 0) == word_first
        got.append((is_word, data[starts[i] : starts[i] + lengths[i]]))
    assert got == ref


def test_matches_reference_random(rng):
    alphabet = b"ab1 -'_\t.xyz"
    for trial in range(20):
        data = bytes(rng.choice(list(alphabet), size=200))
        ref = reference_state_machine(data)
        starts, lengths, word_first = tok.tokenize(data)
        got = []
        for i in range(starts.size):
            is_word = (i % 2 == 0) == word_first
            got.append((is_word, data[starts[i] : starts[i] + lengths[i]]))
        assert got == ref, data


def test_tokens_alternate(text_100kb):
    starts, lengths, word_first = tok.tokenize(text_100kb)
    # coverage: concatenation reproduces input
    parts = [text_100kb[starts[i] : starts[i] + lengths[i]] for i in range(starts.size)]
    assert b"".join(parts) == text_100kb


def test_build_vocabs_roundtrip(text_100kb):
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(text_100kb)
    assert tok.detokenize(ids, word_first, wv, nv) == text_100kb


def test_native_vocab_matches_numpy(text_100kb, rng, monkeypatch):
    """The native hash+sort vocab builder must produce the identical
    (starts, lengths, word_first, ids, vocab order/counts) as the numpy
    key-matrix path."""
    from glz_tpu.utils import native, tokenizer as tok

    if native.lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    mixed = text_100kb[:40_000] + bytes(rng.integers(0, 256, 5_000, dtype=np.uint8).data)
    got = tok.build_vocabs(mixed)
    monkeypatch.setattr(native, "lib", lambda: None)
    want = tok.build_vocabs(mixed)
    for g, w, name in zip(got, want, ["starts", "lengths", "word_first",
                                      "wv", "nv", "ids"]):
        if name in ("wv", "nv"):
            assert g.blob == w.blob, name
            assert np.array_equal(np.asarray(g.offsets), np.asarray(w.offsets)), name
            assert np.array_equal(np.asarray(g.counts), np.asarray(w.counts)), name
        elif name == "word_first":
            assert g == w
        else:
            assert np.array_equal(np.asarray(g), np.asarray(w)), name


def test_detokenize_threaded_path(text_100kb):
    """>= 2^20 tokens triggers the 2-thread detokenize split (utils/native.py);
    the result must equal the single-pass reconstruction byte for byte."""
    from glz_tpu.utils import native, tokenizer as tok

    if native.lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    data = text_100kb * 30  # ~3 MB of text -> > 1M tokens
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(data)
    assert ids.size >= (1 << 20)
    assert tok.detokenize(ids, word_first, wv, nv) == data


# ---- r5: vectorized vocab union (merge_vocab_parts) ---------------------

def _sorted_vocab(tokens, counts):
    import numpy as np

    from glz_tpu.utils.tokenizer import TokenVocab
    order = sorted(range(len(tokens)), key=lambda i: (len(tokens[i]), tokens[i]))
    return TokenVocab([tokens[i] for i in order],
                      np.array([counts[i] for i in order], np.int64))


def test_merge_vocab_parts_oracle(rng):
    """Union of overlapping + disjoint parts matches a dict-merge oracle in
    tokens, counts and per-part id maps; long tokens (> KEY_BYTES) ride the
    dict path and sort after every short token."""
    import numpy as np

    from glz_tpu.utils import tokenizer as tok

    v1 = _sorted_vocab([b"aa", b"zebra", b"x" * 30, b"q"], [5, 2, 1, 7])
    v2 = _sorted_vocab([b"aa", b"mango", b"x" * 30, b"y" * 40], [3, 4, 2, 1])
    parts = [(np.frombuffer(v.blob, np.uint8), np.diff(v.offsets), v.counts)
             for v in (v1, v2)]
    union, maps = tok.merge_vocab_parts(*zip(*parts))

    merged = {}
    for v in (v1, v2):
        for t, c in zip(v.tokens, v.counts):
            merged[t] = merged.get(t, 0) + int(c)
    want = sorted(merged, key=lambda t: (len(t), t))
    assert union.tokens == want
    assert [int(c) for c in union.counts] == [merged[t] for t in want]
    for p, v in enumerate((v1, v2)):
        for i, t in enumerate(v.tokens):
            assert union.tokens[int(maps[p][i])] == t


def test_merge_vocab_parts_empty_parts():
    import numpy as np

    from glz_tpu.utils import tokenizer as tok

    v = _sorted_vocab([b"only"], [3])
    empty = (np.zeros(0, np.uint8), np.zeros(0, np.int64), np.zeros(0, np.int64))
    union, maps = tok.merge_vocab_parts(
        [empty[0], np.frombuffer(v.blob, np.uint8)],
        [empty[1], np.diff(v.offsets)],
        [empty[2], v.counts])
    assert union.tokens == [b"only"] and maps[0].size == 0
    assert int(maps[1][0]) == 0

    union0, maps0 = tok.merge_vocab_parts([empty[0]], [empty[1]], [empty[2]])
    assert union0.n == 0 and maps0[0].size == 0


def test_merge_vocab_parts_matches_build_vocabs(rng):
    """Merging per-shard vocabs of a split corpus reproduces the whole-file
    vocabulary (counts included) — the multihost union invariant."""
    import numpy as np

    from glz_tpu.utils import tokenizer as tok

    words = [b"alpha", b"bravo", b"pku-online", b"x" * 29]
    data = b" ".join(words[int(i)] for i in rng.choice(4, 4000)) + b" "
    cut = len(data) // 2
    # cut on a space so both halves tokenize context-freely
    while data[cut:cut + 1] != b" ":
        cut += 1
    full = tok.build_vocabs(data)
    shards = [tok.build_vocabs(data[:cut]), tok.build_vocabs(data[cut:])]
    for cls in (3, 4):  # wv, nv
        parts = [(np.frombuffer(s[cls].blob, np.uint8),
                  np.diff(s[cls].offsets), s[cls].counts) for s in shards]
        union, _ = tok.merge_vocab_parts(*zip(*parts))
        assert union.tokens == full[cls].tokens
        assert np.array_equal(union.counts, full[cls].counts)
