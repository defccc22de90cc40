"""Test harness config.

Force JAX onto a virtual 8-device CPU platform so sharding/collective tests
run anywhere (SURVEY.md §4: the reference has no distributed testing; this
is the invented TPU-equivalent strategy — CPU-simulated mesh in CI, real
chips in bench).
"""

import os

# Hard-override: the environment presets JAX_PLATFORMS=axon (one real TPU
# chip over a tunnel) and the axon plugin ignores the env var; unit tests
# use the virtual 8-device CPU platform for speed and for mesh simulation.
# Set GLZ_TEST_TPU=1 to run on the chip instead.
if not os.environ.get("GLZ_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x61F2)


def _text_corpus(n: int, rng: np.random.Generator) -> bytes:
    """Synthetic English-like text with a skewed byte distribution."""
    words = [b"the", b"of", b"and", b"huffman", b"canonical", b"tpu", b"code",
             b"block", b"stream", b"kernel", b"pallas", b"mesh", b"jax",
             b"encode", b"decode", b"prefix", b"sum", b"bits", b"a", b"in"]
    probs = rng.dirichlet(np.ones(len(words)) * 0.4)
    parts = []
    size = 0
    while size < n:
        w = words[rng.choice(len(words), p=probs)]
        sep = b" " if rng.random() < 0.9 else (b".\n" if rng.random() < 0.5 else b", ")
        parts.append(w + sep)
        size += len(w) + len(sep)
    return b"".join(parts)[:n]


@pytest.fixture(scope="session")
def text_1mb(rng):
    return _text_corpus(1 << 20, rng)


@pytest.fixture(scope="session")
def text_100kb(rng):
    return _text_corpus(100_000, rng)


@pytest.fixture(scope="session")
def realtext():
    """~1.3 MB of pinned REAL text (tests/fixtures/realtext.txt): verbatim
    READMEs of permissively-licensed packages (markdown/RST markup, tables,
    links, CJK and emoji UTF-8 multibyte), license prose, and sklearn
    dataset descriptions.  Synthetic corpora can't regress on real text
    structure — markup, multibyte runs, indentation — so size-parity and
    round-trip tests run on this next to them (r4 review weak #5; the
    reference's own tests used real log files, unit_tests/test.cc:38)."""
    import pathlib

    return (pathlib.Path(__file__).parent / "fixtures" / "realtext.txt").read_bytes()


@pytest.fixture(scope="session")
def binary_100kb(rng):
    """Skewed binary data exercising all 256 symbols."""
    p = rng.dirichlet(np.ones(256) * 0.05)
    return rng.choice(256, size=100_000, p=p).astype(np.uint8).tobytes()
