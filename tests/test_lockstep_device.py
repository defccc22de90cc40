"""Layout-2 device pipeline on the CPU backend (Pallas interpret mode):
XLA reorder pass vs host oracle, and full lockstep round trips."""

import importlib.util
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from glz_tpu.core import lockstep
from glz_tpu.core.codebook import build_codebook, histogram_bytes
from glz_tpu.models.canonical_byte import (
    compress_bytes_lockstep,
    decompress_bytes_lockstep,
)

# superseded experiment (scatter-based reorder, replaced by the reverse-sweep
# Pallas encode kernel) — lives in exp/, still oracle-tested here
_spec = importlib.util.spec_from_file_location(
    "exp_reorder",
    pathlib.Path(__file__).resolve().parents[1] / "exp" / "reorder.py")
reorder = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(reorder)


def test_refill_masks_device_matches_host(rng):
    lens = rng.integers(0, 33, size=(lockstep.GROUP_STREAMS, 32)).astype(np.uint32)
    lens[5] = 0
    got = np.asarray(reorder.refill_masks_device(jnp.asarray(lens), 32))
    want = lockstep.refill_masks(lens.astype(np.int64))
    assert np.array_equal(got, want)


def test_reorder_device_matches_host(text_100kb):
    S = 64
    G = lockstep.GROUP_STREAMS
    n = G * S - 999
    arr = np.frombuffer((text_100kb * 2)[:n], dtype=np.uint8)
    cb = build_codebook(histogram_bytes(arr))
    lens_flat = np.zeros(G * S, np.uint32)
    lens_flat[:n] = cb.lengths[arr]
    lj_flat = np.zeros(G * S, np.uint32)
    lj_flat[:n] = cb.left_justified_codes()[arr]

    lane_w = reorder.lane_pack_words(jnp.asarray(lj_flat), jnp.asarray(lens_flat), S)
    payload, group_counts, total = reorder.reorder_payload_device(
        jnp.asarray(lens_flat.reshape(G, S)), lane_w, S)

    codes_flat = np.zeros(G * S, np.uint64)
    codes_flat[:n] = cb.codewords[arr]
    h_payload, h_count = lockstep.reorder_payload_host(
        lens_flat.reshape(G, S).astype(np.int64), codes_flat.reshape(G, S))
    assert int(np.asarray(group_counts)[0]) == int(h_count)
    assert int(total) == h_payload.size
    assert np.array_equal(np.asarray(payload)[: int(total)], h_payload)


def _conf(S, **kw):
    from glz_tpu import config as cfg
    return cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP, **kw)


@pytest.mark.parametrize("n_off", [0, 1, 12345])
def test_lockstep_container_roundtrip(text_1mb, n_off):
    data = text_1mb[: (1 << 19) - n_off]
    blob = compress_bytes_lockstep(data, _conf(256))
    assert decompress_bytes_lockstep(blob) == data


def test_lockstep_multigroup(text_1mb):
    blob = compress_bytes_lockstep(text_1mb, _conf(64))
    assert decompress_bytes_lockstep(blob) == text_1mb


@pytest.mark.parametrize("rows", [16, 32])
def test_lockstep_wide_groups_roundtrip(text_1mb, rows):
    """group_rows=16/32 containers (header byte 7) round trip end to end
    through the widened Pallas kernels, including a ragged final group."""
    from glz_tpu.core import container

    data = text_1mb[: rows * 128 * 64 + 12345]
    blob = compress_bytes_lockstep(data, _conf(64, group_rows=rows))
    f = container.read_container(blob)
    assert f.group_rows == rows
    assert decompress_bytes_lockstep(blob) == data


def test_lockstep_via_api(text_100kb):
    from glz_tpu import compress, decompress
    blob = compress(text_100kb, conf=_conf(128))
    assert decompress(blob, backend="device") == text_100kb


def test_lockstep_checksum(text_100kb):
    from glz_tpu import compress, decompress
    blob = compress(text_100kb, conf=_conf(128, checksum=True))
    assert decompress(blob) == text_100kb
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x55  # payload corruption (mid-payload, not pad)
    with pytest.raises(ValueError, match="checksum|corrupt"):
        decompress(bytes(bad))


def test_lockstep_rejects_bad_stream_symbols(text_100kb):
    from glz_tpu import compress
    with pytest.raises(ValueError, match="stream_symbols"):
        compress(text_100kb, conf=_conf(1 << 18))
    with pytest.raises(ValueError, match="stream_symbols"):
        compress(text_100kb, conf=_conf(100))


def test_lockstep_caps_code_length(rng):
    """Skewed input whose unbounded Huffman depth exceeds 26: the lockstep
    path must package-merge down to MAX_FUSED_LEN and still round-trip."""
    from glz_tpu import compress, decompress
    from glz_tpu.core import container
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN

    # geometric-ish frequencies force a deep tree
    reps = [1 << min(i, 22) for i in range(40)]
    arr = np.repeat(np.arange(40, dtype=np.uint8), reps[::-1])
    data = arr[rng.permutation(arr.size)][: 1 << 20].tobytes()
    blob = compress(data, conf=_conf(256))
    f = container.read_container(blob)
    assert int(container.decode_byte_codebook(f.codebook_blob).max()) <= MAX_FUSED_LEN
    assert decompress(blob) == data


def test_decode_groups_gpi_variants(text_1mb):
    """Multi-group-per-instance decode (gpi>1, incl. non-divisible padding)
    must produce exactly the gpi=1 output."""
    from glz_tpu.core import container
    from glz_tpu.core.codebook import canonical_codebook
    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu import config as cfg

    S = 64
    blob = compress_bytes_lockstep(text_1mb, _conf(S))
    f = container.read_container(blob)
    cb = canonical_codebook(container.decode_byte_codebook(f.codebook_blob))
    G = lockstep.GROUP_STREAMS
    gw = f.stream_bits.astype(np.int64)
    n_groups = gw.size
    assert n_groups >= 3, "need multiple groups to exercise gpi"
    starts = np.cumsum(gw) - gw
    counts = np.clip(f.n_symbols - np.arange(n_groups) * G * S, 0, G * S)
    mgw = max(-(-(int(gw.max()) + G + 256) // (1 << 12)) * (1 << 12), 1 << 12)
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    args = (
        jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32)),
        jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(counts.astype(np.int32)),
        jnp.asarray(cb.first_code_left_justified()),
        jnp.asarray(cb.decode_offsets()),
        jnp.asarray(symtab),
    )
    base = np.asarray(pd.decode_groups(
        *args, S, cb.min_len, cb.max_len, mgw, gpi=1, interpret=True))
    for gpi in (2, 3):
        got = np.asarray(pd.decode_groups(
            *args, S, cb.min_len, cb.max_len, mgw, gpi=gpi, interpret=True))
        assert np.array_equal(got, base), f"gpi={gpi} mismatch"


def test_decode_groups_rollrank_matches(text_1mb):
    """The VPU shift-tree rank variant must match the MXU rank path."""
    from glz_tpu.core import container
    from glz_tpu.core.codebook import canonical_codebook
    from glz_tpu.ops import pallas_decode as pd

    S = 64
    blob = compress_bytes_lockstep(text_1mb[: 1 << 19], _conf(S))
    f = container.read_container(blob)
    cb = canonical_codebook(container.decode_byte_codebook(f.codebook_blob))
    G = lockstep.GROUP_STREAMS
    gw = f.stream_bits.astype(np.int64)
    starts = np.cumsum(gw) - gw
    counts = np.clip(f.n_symbols - np.arange(gw.size) * G * S, 0, G * S)
    mgw = max(-(-(int(gw.max()) + G + 256) // (1 << 12)) * (1 << 12), 1 << 12)
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    args = (
        jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32)),
        jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(counts.astype(np.int32)),
        jnp.asarray(cb.first_code_left_justified()),
        jnp.asarray(cb.decode_offsets()),
        jnp.asarray(symtab),
    )
    base = np.asarray(pd.decode_groups(
        *args, S, cb.min_len, cb.max_len, mgw, interpret=True))
    got = np.asarray(pd.decode_groups(
        *args, S, cb.min_len, cb.max_len, mgw, probe="rollrank",
        interpret=True))
    assert np.array_equal(got, base)
