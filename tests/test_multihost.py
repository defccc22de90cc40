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
         S: int = 4096, kind: str = "byte", env: dict | None = None) -> bytes:
    import os

    infile = tmp_path / "in.bin"
    infile.write_bytes(data)
    outfile = tmp_path / f"out_{kind}_{swap}.glz"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), str(nproc), str(port),
             str(infile), str(outfile), "1" if swap else "0", str(S), kind],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env={**os.environ, **env} if env else None)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"proc {p.args[2]} rc={p.returncode}\n{se.decode()[-2000:]}")
    return outfile.read_bytes()


def _run_expect_fail(tmp_path, data: bytes, nproc: int, S: int, kind: str,
                     mode: str = "2") -> str:
    infile = tmp_path / "in.bin"
    infile.write_bytes(data)
    outfile = tmp_path / "out_fail.glz"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), str(nproc), str(port),
             str(infile), str(outfile), mode, str(S), kind],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    assert any(p.returncode != 0 for p in procs)
    return b"".join(se for _, se in outs).decode()


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


# ---- lockstep (layout-2) multihost: the flagship Pallas path ------------

def test_multihost_lockstep_roundtrip(tmp_path, corpus):
    """BASELINE config 5 on the flagship layout: per-host Pallas encode
    with a shared codebook, host-0 group-table stitch, bit-exact decode."""
    from glz_tpu import decompress
    from glz_tpu.core import container

    data = (corpus * 2)[:180_000]  # shard 0 gets one full 64 KiB group
    blob = _run(tmp_path, data, nproc=2, S=64, kind="lockstep")
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == data


def test_multihost_lockstep_swap_detected(tmp_path, corpus):
    """Equal group-aligned shards fed in the wrong order must not
    reproduce the file (stitch order is load-bearing)."""
    from glz_tpu import decompress

    data = (corpus * 2)[: 2 * 1024 * 64]  # exactly 2 lockstep groups at S=64
    blob = _run(tmp_path, data, nproc=2, swap=True, S=64, kind="lockstep")
    assert decompress(blob) != data


def test_multihost_lockstep_misaligned_rejected(tmp_path, corpus):
    stderr = _run_expect_fail(tmp_path, corpus, nproc=2, S=64, kind="lockstep")
    assert "group" in stderr and "align shard boundaries" in stderr


# ---- HuffWord multihost: vocab union + dual-codebook lockstep ----------

def _word_corpus(rng, n_words: int) -> bytes:
    words = [b"alpha", b"bravo12", b"x", b"compress", b"tpu9", b"glz",
             b"lockstep", b"mesh", b"q", b"dictionary"]
    picks = rng.choice(len(words), size=n_words)
    return b" ".join(words[i] for i in picks) + b" "


def test_multihost_huffword_roundtrip(tmp_path, rng):
    """HuffWord multihost: shards tokenized independently, vocabularies
    unioned via process_allgather, one shared dual codebook, stitched
    layout-2 container decodes bit-exactly."""
    from glz_tpu import decompress
    from glz_tpu.core import container

    data = _word_corpus(rng, 80_000)  # ~160k tokens > 2 groups at S=64
    blob = _run(tmp_path, data, nproc=2, S=64, kind="huffword")
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP and f.mode == 1
    assert decompress(blob) == data


def test_multihost_huffword_swap_detected(tmp_path, rng):
    from glz_tpu import decompress
    from glz_tpu.utils import tokenizer as tok

    raw = _word_corpus(rng, 80_000)
    starts, _, _ = tok.tokenize(raw)
    data = raw[: int(starts[2 * 1024 * 64])]  # exactly 2 groups of tokens
    blob = _run(tmp_path, data, nproc=2, swap=True, S=64, kind="huffword")
    assert decompress(blob) != data


def test_multihost_huffword_misaligned_rejected(tmp_path, rng):
    data = _word_corpus(rng, 80_000)
    stderr = _run_expect_fail(tmp_path, data, nproc=2, S=64, kind="huffword")
    assert "split_huffword_shards" in stderr


def test_split_huffword_shards_contract(rng):
    """The planner's offsets satisfy the documented contract: every
    non-last shard re-tokenizes to a multiple of GROUP_STREAMS*S tokens
    with the same first-token class."""
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.parallel.multihost import split_huffword_shards
    from glz_tpu.utils import tokenizer as tok

    data = _word_corpus(rng, 80_000)
    S = 64
    bounds = split_huffword_shards(
        data, 2, GlzConfig(stream_symbols=S, layout=LAYOUT_LOCKSTEP))
    assert bounds[0] == 0 and bounds[-1] == len(data)
    classes = []
    for k in range(2):
        shard = data[bounds[k] : bounds[k + 1]]
        starts, _, word_first = tok.tokenize(shard)
        if k < 1:
            assert starts.size % (1024 * S) == 0
        classes.append(word_first)
    assert classes[0] == classes[1]


def test_multihost_decompress_lockstep(tmp_path, corpus):
    """Shard-parallel decompress: N processes each decode a contiguous
    group range of one lockstep container and emit (offset, bytes) slices
    that reassemble to the original file."""
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP

    data = (corpus * 2)[:180_000]
    blob = compress(data, conf=GlzConfig(stream_symbols=64,
                                         layout=LAYOUT_LOCKSTEP))
    infile = tmp_path / "in.glz"
    infile.write_bytes(blob)
    outfile = tmp_path / "out.bin"
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), str(nproc), str(port),
             str(infile), str(outfile), "0", "64", "dec"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    parts = []
    for i in range(nproc):
        raw = (tmp_path / f"out.bin.part{i}").read_bytes()
        parts.append((int.from_bytes(raw[:8], "little"), raw[8:]))
    parts.sort()
    assert parts[0][0] == 0 and parts[1][0] == len(parts[0][1])
    assert b"".join(p[1] for p in parts) == data


def test_multihost_decompress_huffword(tmp_path, rng):
    """Shard-parallel huffword decompress: group ranges preserve token
    parity; byte offsets come from an allgather of local output sizes."""
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP, MODE_HUFFWORD

    data = _word_corpus(rng, 80_000)
    blob = compress(data, mode=MODE_HUFFWORD,
                    conf=GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP))
    infile = tmp_path / "in.glz"
    infile.write_bytes(blob)
    outfile = tmp_path / "out.bin"
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(i), str(nproc), str(port),
             str(infile), str(outfile), "0", "64", "dec_hw"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    parts = []
    for i in range(nproc):
        raw = (tmp_path / f"out.bin.part{i}").read_bytes()
        parts.append((int.from_bytes(raw[:8], "little"), raw[8:]))
    parts.sort()
    assert all(len(p[1]) > 0 for p in parts)  # both hosts decoded a range
    assert parts[1][0] == len(parts[0][1])
    assert b"".join(p[1] for p in parts) == data


def test_multihost_decompress_single_process(corpus):
    """With one process, decompress_bytes_multihost degenerates to a full
    decode at offset 0 (no jax.distributed needed)."""
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.parallel.multihost import decompress_bytes_multihost

    data = (corpus * 2)[:150_000]
    blob = compress(data, conf=GlzConfig(stream_symbols=64,
                                         layout=LAYOUT_LOCKSTEP))
    local, off = decompress_bytes_multihost(blob)
    assert off == 0 and local == data


def test_multihost_decompress_rejects_bitstream(corpus):
    from glz_tpu import compress
    from glz_tpu.parallel.multihost import decompress_bytes_multihost

    with pytest.raises(ValueError, match="lockstep"):
        decompress_bytes_multihost(compress(corpus[:10_000]))


def test_multihost_lockstep_wide_groups(tmp_path, corpus):
    """Wide-group (rows=16) lockstep multihost: shards align to the wider
    group, the stitched container records the geometry, decodes bit-exact."""
    import subprocess as sp

    from glz_tpu import decompress
    from glz_tpu.core import container

    data = (corpus * 3)[:290_000]  # shard 0 gets one full 128 KiB group
    infile = tmp_path / "in.bin"
    infile.write_bytes(data)
    outfile = tmp_path / "out16.glz"
    port = _free_port()
    procs = [
        sp.Popen([sys.executable, str(DRIVER), str(i), "2", str(port),
                  str(infile), str(outfile), "0", "64", "lockstep", "16"],
                 cwd=REPO, stdout=sp.PIPE, stderr=sp.PIPE)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    blob = outfile.read_bytes()
    f = container.read_container(blob)
    assert f.group_rows == 16
    assert decompress(blob) == data


def test_huffword_multihost_rows_cap():
    """conf.group_rows flows to the huffword multihost path, capped by the
    dual kernel's non-pack2 VMEM bound (known before the vocab union)."""
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.parallel.multihost import huffword_multihost_rows

    assert huffword_multihost_rows(
        GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP,
                  group_rows=64)) == 64
    assert huffword_multihost_rows(
        GlzConfig(stream_symbols=512, layout=LAYOUT_LOCKSTEP,
                  group_rows=64)) == 16
    assert huffword_multihost_rows(
        GlzConfig(stream_symbols=1024, layout=LAYOUT_LOCKSTEP,
                  group_rows=8)) == 8


# ---- r5: stitched checksum + host-disjoint vocab union ------------------

def test_multihost_lockstep_checksum(tmp_path, corpus):
    """conf.checksum on the multihost lockstep path: per-shard crc32s are
    combined with utils/crc.crc32_combine into the whole-file checksum, and
    a corrupted stitched payload fails the crc on decode (closes the r4 A2
    hole: multihost containers previously carried no checksum)."""
    import zlib

    import pytest

    from glz_tpu import decompress
    from glz_tpu.core import container

    data = (corpus * 2)[:180_000]
    blob = _run(tmp_path, data, nproc=2, S=64, kind="lockstep",
                env={"GLZ_MH_CHECKSUM": "1"})
    f = container.read_container(blob)
    assert f.checksum == zlib.crc32(data) & 0xFFFFFFFF
    assert decompress(blob) == data  # decode verifies the crc

    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x40  # flip a payload bit
    with pytest.raises(ValueError, match="checksum mismatch"):
        decompress(bytes(bad))


def test_multihost_bitstream_checksum(tmp_path, corpus):
    import zlib

    from glz_tpu import decompress
    from glz_tpu.core import container

    blob = _run(tmp_path, corpus, nproc=2, env={"GLZ_MH_CHECKSUM": "1"})
    f = container.read_container(blob)
    assert f.checksum == zlib.crc32(corpus) & 0xFFFFFFFF
    assert decompress(blob) == corpus


def test_multihost_huffword_disjoint_vocabs(tmp_path, rng):
    """The vocab-union path with HOST-DISJOINT vocabularies — the case the
    union exists for (the r4 review found the shared-word corpus gave every
    host the full vocabulary, leaving union remapping unexercised): shard 0
    holds only a-words separated by spaces, shard 1 only b-words separated
    by tabs; the stitched container must carry the true union and remapped
    ids must decode bit-exactly."""
    import zlib

    from glz_tpu import decompress
    from glz_tpu.core import container
    from glz_tpu.models.huffword import _decode_dict_blob

    A = [b"alphaonly", b"aardvark", b"a1z", b"aq"]
    B = [b"bravoonly", b"balloon", b"b2y", b"bx"]
    S, rows = 64, 8
    half_words = rows * 128 * S // 2  # one full group of tokens per shard
    partA = b"".join(A[int(i)] + b" " for i in rng.choice(4, half_words))
    partB = b"".join(B[int(i)] + b"\t" for i in rng.choice(4, half_words))
    data = partA + partB
    blob = _run(tmp_path, data, nproc=2, S=S, kind="huffword",
                env={"GLZ_MH_CHECKSUM": "1"})
    f = container.read_container(blob)
    assert f.checksum == zlib.crc32(data) & 0xFFFFFFFF
    assert decompress(blob) == data

    # the stitched word dictionary is the true union of the disjoint vocabs
    mv = memoryview(f.codebook_blob)
    wl, woff, wblob, off = _decode_dict_blob(mv, 1)
    nl, noff, nblob, off = _decode_dict_blob(mv, off)
    words = {bytes(wblob[woff[i]:woff[i + 1]]) for i in range(wl.size)}
    nwords = {bytes(nblob[noff[i]:noff[i + 1]]) for i in range(nl.size)}
    assert words == set(A) | set(B)
    assert nwords == {b" ", b"\t"}


def test_allgather_int64_exact():
    """The r4 advisor's medium finding: values past 2^31 must survive the
    collective exactly (jnp.asarray silently truncates int64 to int32).
    Single-process process_allgather exercises the same wire format."""
    import numpy as np

    from glz_tpu.parallel.multihost import _allgather, _gather_ragged

    big = (1 << 33) + 5
    got = _allgather([big, 7, (1 << 40) + 123])
    assert got.shape == (1, 3)
    assert int(got[0, 0]) == big
    assert int(got[0, 2]) == (1 << 40) + 123

    arr = np.array([1, (1 << 35) + 9, 2**62], np.int64)
    parts = _gather_ragged(arr)
    assert len(parts) == 1 and np.array_equal(parts[0], arr)

    u8 = np.arange(13, dtype=np.uint8)
    assert np.array_equal(_gather_ragged(u8)[0], u8)

    import pytest
    with pytest.raises(ValueError, match="non-negative"):
        _allgather([-1])
