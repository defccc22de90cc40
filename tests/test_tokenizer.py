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
