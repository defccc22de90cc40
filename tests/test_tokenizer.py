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
