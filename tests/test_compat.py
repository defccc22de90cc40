"""Interop with the reference implementation's on-disk formats.

Cross-checks against a freshly-built reference binary when the reference
tree + toolchain are available (compressor_func_test oracle pattern,
unit_tests/test.cc:48-84)."""

import pathlib
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from glz_tpu.compat import glzip_format as gz

REF_INCLUDE = pathlib.Path("/root/reference/include")
REF_UTILS = pathlib.Path("/root/reference/utils/include")

DRIVER_SRC = r"""
#include <cstdio>
#include <string>
#include "compressor.h"
#include "canonical_huff_encoder.h"
#include "normal_huff_encoder.h"
using namespace glzip;
int main(int argc, char** argv) {
  std::string mode = argv[1]; std::string in = argv[2]; std::string out = argv[3];
  if (mode == "c2") { Compressor<CanonicalHuffEncoder<unsigned char> > c(in, out); c.compress(); }
  else if (mode == "d2") { Decompressor<CanonicalHuffDecoder<unsigned char> > d(in, out); d.decompress(); }
  else if (mode == "d2f") { Decompressor<FastCanonicalHuffDecoder<unsigned char> > d(in, out); d.decompress(); }
  else if (mode == "d2t") { Decompressor<TableCanonicalHuffDecoder<unsigned char, 8> > d(in, out); d.decompress(); }
  else if (mode == "c1") { Compressor<NormalHuffEncoder<unsigned char> > c(in, out); c.compress(); }
  else if (mode == "d1") { Decompressor<NormalHuffDecoder<unsigned char> > d(in, out); d.decompress(); }
  else return 2;
  return 0;
}
"""


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    if not REF_INCLUDE.exists() or shutil.which("g++") is None:
        pytest.skip("reference tree or g++ unavailable")
    d = tmp_path_factory.mktemp("refbuild")
    src = d / "driver.cc"
    src.write_text(DRIVER_SRC)
    exe = d / "refglzip"
    r = subprocess.run(
        ["g++", "-O2", "-w", f"-I{REF_INCLUDE}", f"-I{REF_UTILS}",
         str(src), "-o", str(exe)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"reference build failed: {r.stderr[:200]!r}")
    return exe


def run_ref(exe, mode, data: bytes, tmp_path) -> bytes:
    fin = tmp_path / "in.bin"
    fout = tmp_path / "out.bin"
    fin.write_bytes(data)
    subprocess.run([str(exe), mode, str(fin), str(fout)], check=True, timeout=120)
    return fout.read_bytes()


# ---- our codec alone -----------------------------------------------------

def test_crs2_roundtrip_ours(text_100kb):
    blob = gz.write_crs2(text_100kb)
    assert gz.read_crs2(blob) == text_100kb


def test_crs_roundtrip_ours(text_100kb):
    data = text_100kb[:20_000]
    blob = gz.write_crs(data)
    assert gz.read_crs(blob) == data


@pytest.mark.parametrize("payload", [b"", b"a", b"ab" * 5, bytes(range(256))])
def test_crs_formats_edges(payload):
    assert gz.read_crs2(gz.write_crs2(payload)) == payload
    assert gz.read_crs(gz.write_crs(payload)) == payload


# ---- cross-interop with the reference binary -----------------------------

def test_reference_decodes_our_crs2(ref_binary, tmp_path, text_100kb):
    data = text_100kb[:50_000]
    blob = gz.write_crs2(data)
    for mode in ("d2", "d2f", "d2t"):
        got = run_ref(ref_binary, mode, blob, tmp_path)
        assert got == data, f"reference {mode} mismatch"


def test_we_decode_reference_crs2(ref_binary, tmp_path, text_100kb):
    data = text_100kb[:50_000]
    blob = run_ref(ref_binary, "c2", data, tmp_path)
    assert gz.read_crs2(blob) == data


def test_crs2_size_parity(ref_binary, tmp_path, text_1mb):
    """BASELINE config 1: compressed size <= the reference's."""
    data = text_1mb
    ours = gz.write_crs2(data)
    theirs = run_ref(ref_binary, "c2", data, tmp_path)
    assert len(ours) <= len(theirs)


def test_reference_decodes_our_crs(ref_binary, tmp_path, text_100kb):
    data = text_100kb[:20_000]
    blob = gz.write_crs(data)
    got = run_ref(ref_binary, "d1", blob, tmp_path)
    assert got == data


def test_we_decode_reference_crs(ref_binary, tmp_path, text_100kb):
    data = text_100kb[:20_000]
    blob = run_ref(ref_binary, "c1", data, tmp_path)
    assert gz.read_crs(blob) == data


def test_glz_container_beats_reference_size(ref_binary, tmp_path, text_1mb):
    """Our native container (single-stream ratio preset) is smaller than
    the reference's .crs2 for the same data."""
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig
    ours = compress(text_1mb, conf=GlzConfig(stream_symbols=1 << 20))
    theirs = run_ref(ref_binary, "c2", text_1mb, tmp_path)
    assert len(ours) < len(theirs)


# ---- .crs3 HuffWord format ----------------------------------------------
# Boost is not installed in this image, so the reference's HuffWord encoder
# (test_huffword.cc needs Boost.Serialization) cannot be compiled for a
# cross-decode; write_crs3/read_crs3 implement the documented archive
# layout (canonical_huffword.h:311-358) directly and are covered by self
# round-trip + size tests here.

def test_crs3_roundtrip(text_100kb):
    data = text_100kb[:60_000]
    blob = gz.write_crs3(data)
    assert gz.read_crs3(blob) == data


def test_crs3_golden_fixture():
    """Pin the archive grammar with a frozen fixture (r3 missing #4):
    write_crs3 must reproduce tests/fixtures/golden.crs3 byte-for-byte and
    read_crs3 must decode it.  The fixture is self-derived (Boost is absent
    from this image, so it pins against grammar DRIFT, not against a real
    Boost build); if an intentional format change regenerates it, the
    heuristic fields it freezes — library-version width disambiguation at
    glzip_format.py:214-224 in particular — must be re-reviewed."""
    import pathlib

    fdir = pathlib.Path(__file__).parent / "fixtures"
    golden = (fdir / "golden.crs3").read_bytes()
    original = (fdir / "golden.crs3.txt").read_bytes()
    assert gz.read_crs3(golden) == original
    assert gz.write_crs3(original) == golden


@pytest.mark.parametrize("payload", [b"", b"a", b"hello world", b"  --  ",
                                     b"a-b c_d 'e", b"word " * 500])
def test_crs3_edges(payload):
    assert gz.read_crs3(gz.write_crs3(payload)) == payload


def test_crs3_nonword_first(text_100kb):
    data = b"... " + text_100kb[:20_000]
    assert gz.read_crs3(gz.write_crs3(data)) == data


def test_crs3_header_fields(text_100kb):
    """Parse back the archive preamble + first dict header and check the
    documented field sequence (canonical_huffword.h:311-358)."""
    import struct

    data = text_100kb[:10_000]
    blob = gz.write_crs3(data)
    (siglen,) = struct.unpack_from("<Q", blob, 0)
    assert blob[8 : 8 + siglen] == b"serialization::archive"
    ia = gz._ArchiveReader(blob)
    n_sym = ia.u32()
    max_len = ia.i32()
    min_len = ia.i32()
    assert 0 < min_len <= max_len <= 32
    assert n_sym > 1  # vocab + EOF pseudo-symbol


def test_huffword_container_smaller_than_crs3(text_1mb):
    """BASELINE config 3 size bound: our huffword .glz (length-table
    codebook) must undercut the reference's .crs3 (Boost archive with
    8-byte string length prefixes and a u32 symbol_index per symbol)."""
    from glz_tpu import compress
    from glz_tpu.config import MODE_HUFFWORD

    ours = compress(text_1mb, mode=MODE_HUFFWORD)
    crs3 = gz.write_crs3(text_1mb)
    assert len(ours) <= len(crs3)


def test_crs3_corrupt_raises():
    blob = gz.write_crs3(b"some words here")
    with pytest.raises(ValueError):
        gz.read_crs3(blob[:30])
    with pytest.raises(ValueError):
        gz.read_crs3(b"\x00" * 64)


# ---- r5: real-text fixture (tests/fixtures/realtext.txt) -----------------
# Markup, UTF-8 multibyte and long indentation runs that the synthetic
# corpora cannot produce; the reference's own tests ran on real files
# (unit_tests/test.cc:38).

def test_crs2_size_parity_realtext(ref_binary, tmp_path, realtext):
    ours = gz.write_crs2(realtext)
    theirs = run_ref(ref_binary, "c2", realtext, tmp_path)
    assert len(ours) <= len(theirs)


def test_reference_decodes_our_crs2_realtext(ref_binary, tmp_path, realtext):
    data = realtext[:200_000]
    blob = gz.write_crs2(data)
    got = run_ref(ref_binary, "d2t", blob, tmp_path)
    assert got == data


def test_glz_beats_reference_size_realtext(ref_binary, tmp_path, realtext):
    from glz_tpu import compress
    from glz_tpu.config import GlzConfig

    ours = compress(realtext, conf=GlzConfig(stream_symbols=1 << 21))
    theirs = run_ref(ref_binary, "c2", realtext, tmp_path)
    assert len(ours) < len(theirs)


def test_huffword_smaller_than_crs3_realtext(realtext):
    from glz_tpu import compress
    from glz_tpu.config import MODE_HUFFWORD

    ours = compress(realtext, mode=MODE_HUFFWORD)
    crs3 = gz.write_crs3(realtext)
    assert len(ours) <= len(crs3)


def test_crs3_roundtrip_realtext(realtext):
    data = realtext[:150_000]
    assert gz.read_crs3(gz.write_crs3(data)) == data
