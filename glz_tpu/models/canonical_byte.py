"""Canonical byte-symbol codec — the flagship "model".

Device orchestration of the byte path: histogram on device, codebook on host
(257 symbols, microseconds), then block-parallel device encode/decode
(glz_tpu.ops).  Mirrors the reference's primary entry point
Compressor<CanonicalHuffEncoder<>>::compress (compressor.h:62-73) as a pure
data-parallel pipeline.

Large inputs are encoded in dispatches of <= MAX_DISPATCH_SYMBOLS symbols.
Dispatch payloads are concatenated word-aligned by inflating the recorded
bit length of each dispatch's last stream with <=31 alignment pad bits: the
stream-bit table stores "bits to advance to the next stream's start", decode
never reads past a stream's symbol count, so padding is invisible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from glz_tpu import config as cfg
from glz_tpu.core import bitio, container
from glz_tpu.core.api import _plan_streams
from glz_tpu.core.codebook import build_codebook, canonical_codebook, sampled_histogram
from glz_tpu.ops import decode as decode_ops
from glz_tpu.ops import encode as encode_ops

MAX_DISPATCH_SYMBOLS = 1 << 27  # keeps per-dispatch bit offsets < 2^32
LOCKSTEP_DISPATCH = 1 << 26     # symbols per layout-2 dispatch (HBM transients ~16x)


def _device_codebook_arrays(cb, table_bits: int):
    lut, fc_lj, sp, syms = cb.decode_luts(table_bits)
    return (
        jnp.asarray(lut, dtype=jnp.uint32),
        jnp.asarray(fc_lj, dtype=jnp.uint32),
        jnp.asarray(sp, dtype=jnp.uint32),
        jnp.asarray(syms, dtype=jnp.uint32),
    )


def compress_bytes_device(data: bytes | np.ndarray, conf: cfg.GlzConfig = cfg.DEFAULT,
                          codebook=None) -> bytes:
    """codebook: optional pre-built shared Codebook (shared-codebook batch /
    multi-host: every file must encode with the same code)."""
    if conf.layout == cfg.LAYOUT_LOCKSTEP:
        return compress_bytes_lockstep(data, conf, codebook=codebook)
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    n = arr.size
    if n == 0:
        from glz_tpu.core.api import compress_bytes_host
        return compress_bytes_host(arr, conf)

    stream_symbols = _plan_streams(n, conf)
    dispatch = (MAX_DISPATCH_SYMBOLS // stream_symbols) * stream_symbols
    dispatch = max(dispatch, stream_symbols)

    # ---- phase 1: histogram (host native; the data lives there anyway —
    # XLA's scatter-add serializes at ~MB/s on real TPUs and the one-hot
    # matmul is HBM-bound, see ops/histogram.py) ----
    darr = jnp.asarray(arr)

    # ---- phase 2: codebook (host) ----
    cb = codebook if codebook is not None else build_codebook(
        sampled_histogram(arr, conf.histogram_budget), conf.length_limit)
    code_lut = jnp.asarray(cb.codewords, dtype=jnp.uint32)
    len_lut = jnp.asarray(cb.lengths, dtype=jnp.int32)
    # Pallas fast path needs 64 KiB tiles and left-justified code table
    use_pallas = jax.default_backend() != "cpu" and (stream_symbols & (stream_symbols - 1)) == 0
    if use_pallas:
        lj_tbl = jnp.asarray(cb.left_justified_codes())
        len_tbl = jnp.asarray(cb.lengths.astype(np.uint32))
        pad_quantum = max(stream_symbols, 1 << 16)
    else:
        pad_quantum = stream_symbols

    # ---- phase 3: block-parallel encode (device) ----
    payload_parts: list[bytes] = []
    stream_bits_parts: list[np.ndarray] = []
    bits_so_far = 0
    for lo in range(0, n, dispatch):
        hi = min(n, lo + dispatch)
        chunk = darr[lo:hi]
        n_valid = hi - lo
        padded_n = -(-n_valid // pad_quantum) * pad_quantum
        if padded_n != n_valid:
            chunk = jnp.pad(chunk, (0, padded_n - n_valid))
        if use_pallas:
            words, total_bits, stream_bits = encode_ops.encode_block_fast(
                chunk, jnp.int32(n_valid), lj_tbl, len_tbl, stream_symbols,
                max_len=cb.max_len)
        else:
            words, total_bits, stream_bits = encode_ops.encode_block(
                chunk, jnp.int32(n_valid), code_lut, len_lut, stream_symbols)
        total_bits = int(total_bits)
        n_words = (total_bits + 31) >> 5
        wnp = np.asarray(words[:n_words]).astype(np.uint32)
        sb = np.asarray(stream_bits).astype(np.int64)
        # drop streams that are entirely padding (zero symbols)
        n_streams_chunk = -(-n_valid // stream_symbols)
        sb = sb[:n_streams_chunk]
        # word-align this dispatch: inflate last stream's recorded advance
        pad = n_words * 32 - total_bits
        sb[-1] += pad
        payload_parts.append(wnp.astype(">u4").tobytes())
        stream_bits_parts.append(sb)
        bits_so_far += total_bits + pad

    stream_bits = np.concatenate(stream_bits_parts)
    payload = b"".join(payload_parts)
    # final container payload is already byte aligned (word aligned per part)
    f = container.GlzFile(
        mode=cfg.MODE_BYTE,
        n_symbols=n,
        stream_symbols=stream_symbols,
        stream_bits=stream_bits,
        codebook_blob=container.encode_byte_codebook(cb.lengths.astype(np.uint8)),
        payload=payload,
        checksum=_crc(arr, conf),
    )
    return container.write_container(f)


def _crc(arr: np.ndarray, conf: cfg.GlzConfig) -> int | None:
    if not conf.checksum:
        return None
    import zlib
    return zlib.crc32(arr.tobytes())


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lockstep_stream_symbols(conf: cfg.GlzConfig) -> int:
    """Validate conf.stream_symbols for the lockstep layout (the Pallas
    kernels' VMEM window budget wants a power of two in [64, 8192])."""
    S = conf.stream_symbols
    if S & (S - 1) or not 64 <= S <= 8192:
        raise ValueError(
            f"lockstep layout needs stream_symbols a power of two in "
            f"[64, 8192], got {S}; use cfg.THROUGHPUT or set it explicitly")
    return S


def compress_bytes_lockstep(data: bytes | np.ndarray,
                            conf: cfg.GlzConfig = cfg.THROUGHPUT,
                            codebook=None) -> bytes:
    """Layout-2 (lockstep) device compression — the TPU throughput path.

    Streams are grouped 1024 per group (8 rows x 128 lanes); the payload is
    emitted in decoder consumption order (core/lockstep.py) so the Pallas
    decode kernel reads it sequentially.  Codebook lengths are capped at 26
    (package-merge) so the fused lj|len entry word of the reverse-sweep
    kernel always applies — the cap costs <0.01% ratio on real inputs.

    codebook: optional pre-built shared Codebook (multi-host shards must
    encode with one global code; max_len must be <= MAX_FUSED_LEN)."""
    from glz_tpu.core import lockstep
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN, encode_payload_from_symbols

    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    n = arr.size
    S = _lockstep_stream_symbols(conf)
    rows = conf.group_rows
    if rows not in (8, 16, 32, 64):
        raise ValueError(f"group_rows must be 8, 16, 32 or 64, got {rows}")
    G = rows * lockstep.LANES
    group_syms = G * S
    if n == 0:
        from glz_tpu.core.api import compress_bytes_host
        return compress_bytes_host(arr, conf)

    darr = jnp.asarray(arr)
    limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    spec_rows = 0
    if codebook is not None:
        cb = codebook
        if cb.max_len > MAX_FUSED_LEN:  # assert would vanish under -O and
            raise ValueError(            # silently corrupt the fused entries
                f"shared codebook max_len {cb.max_len} exceeds the "
                f"fused-entry limit {MAX_FUSED_LEN}")
    else:
        from glz_tpu.ops.pallas_encode import estimate_group_rows
        freqs = sampled_histogram(arr, conf.histogram_budget)
        cb = build_codebook(freqs, limit)
        # speculative kernel geometry (pallas_encode._launch): dispatch
        # before the group word counts reach the host; exact re-run if the
        # histogram-derived bound is ever exceeded
        spec_rows = estimate_group_rows(freqs, cb.lengths, S, rows)
    entry_tbl = jnp.asarray(cb.left_justified_codes() | cb.lengths.astype(np.uint32))

    interpret = jax.default_backend() == "cpu"
    dispatch = _round_up(min(LOCKSTEP_DISPATCH, n), group_syms)
    payload_parts: list[np.ndarray] = []
    counts_parts: list[np.ndarray] = []
    for lo in range(0, n, dispatch):
        hi = min(n, lo + dispatch)
        n_valid = hi - lo
        padded = _round_up(n_valid, group_syms)
        chunk = darr[lo:hi]
        if padded != n_valid:
            chunk = jnp.pad(chunk, (0, padded - n_valid))
        payload, group_counts = encode_payload_from_symbols(
            chunk, jnp.int32(n_valid), entry_tbl, S, interpret=interpret,
            rows=rows, spec_rows=spec_rows)
        total = int(group_counts.sum())
        payload_parts.append(np.asarray(payload[:total]).astype(np.uint32))
        counts_parts.append(group_counts)

    group_counts = np.concatenate(counts_parts)
    payload = np.concatenate(payload_parts) if payload_parts else np.zeros(0, np.uint32)
    f = container.GlzFile(
        mode=cfg.MODE_BYTE,
        n_symbols=n,
        stream_symbols=S,
        stream_bits=group_counts,
        codebook_blob=container.encode_byte_codebook(cb.lengths.astype(np.uint8)),
        payload=payload.astype("<u4").tobytes(),
        layout=container.LAYOUT_LOCKSTEP,
        checksum=_crc(arr, conf),
        group_rows=rows,
    )
    return container.write_container(f)


def decompress_bytes_lockstep(blob: bytes) -> bytes:
    """Decode a layout-2 container with the Pallas lockstep kernel."""
    from glz_tpu.core import lockstep
    from glz_tpu.ops import pallas_decode as pd

    f = container.read_container(blob)
    if f.layout != container.LAYOUT_LOCKSTEP:
        raise ValueError("not a lockstep-layout container")
    if f.n_symbols == 0:
        return b""
    lengths = container.decode_byte_codebook(f.codebook_blob)
    cb = canonical_codebook(lengths)
    S = f.stream_symbols
    rows = f.group_rows
    G = rows * lockstep.LANES
    group_words = f.stream_bits.astype(np.int64)
    n_groups = group_words.size
    group_starts = np.cumsum(group_words) - group_words
    group_counts = np.clip(f.n_symbols - np.arange(n_groups) * G * S, 0, G * S)

    # static VMEM window: bucket to 256 KiB steps to limit recompiles while
    # staying within the ~16 MB VMEM budget (window + output block)
    need = int(group_words.max()) + G + 2 * lockstep.LANES
    mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
    assert mgw * 4 + S // 4 * G * 4 < 12 * (1 << 20), (
        f"group window {mgw * 4} B exceeds VMEM budget; lower stream_symbols")

    payload = jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32))
    symtab = np.zeros(256, np.uint32)
    symtab[: cb.symbols.size] = cb.symbols
    interpret = jax.default_backend() == "cpu"
    out = pd.decode_groups(
        payload,
        jnp.asarray(group_starts.astype(np.int32)),
        jnp.asarray(group_counts.astype(np.int32)),
        jnp.asarray(cb.first_code_left_justified()),
        jnp.asarray(cb.decode_offsets()),
        jnp.asarray(symtab),
        S, cb.min_len, cb.max_len, mgw, interpret=interpret, rows=rows)
    flat = np.asarray(pd.unpack_symbols(out, S, rows))
    from glz_tpu.core.api import _verify
    return _verify(flat[: f.n_symbols].tobytes(), f)


def decompress_bytes_device(blob: bytes, table_bits: int = 16,
                            streams_per_dispatch: int | None = None) -> bytes:
    f = container.read_container(blob)
    if f.mode != cfg.MODE_BYTE:
        raise ValueError("not a byte-mode container")
    if f.layout == container.LAYOUT_LOCKSTEP:
        return decompress_bytes_lockstep(blob)
    if f.n_symbols == 0:
        return b""
    lengths = container.decode_byte_codebook(f.codebook_blob)
    cb = canonical_codebook(lengths)
    lut, fc_lj, sp, syms = _device_codebook_arrays(cb, table_bits)

    words_np = bitio.bytes_to_words(f.payload)
    starts = np.concatenate([[0], np.cumsum(f.stream_bits.astype(np.uint64))[:-1]])
    ends = starts + f.stream_bits.astype(np.uint64)
    n_streams = f.n_streams
    S = f.stream_symbols

    if streams_per_dispatch is None:
        streams_per_dispatch = n_streams
    out_parts: list[np.ndarray] = []
    whole_payload_on_device = int(ends[-1]) < (1 << 32)
    dwords_full = jnp.asarray(words_np) if whole_payload_on_device else None
    for lo in range(0, n_streams, streams_per_dispatch):
        hi = min(n_streams, lo + streams_per_dispatch)
        if whole_payload_on_device:
            dwords = dwords_full
            rel = starts[lo:hi]
        else:
            # slice the payload at the word boundary of this dispatch's
            # first stream so relative cursors stay < 2^32
            base_word = int(starts[lo] >> 5)
            end_word = int(-(-int(ends[hi - 1]) // 32))
            dwords = jnp.asarray(words_np[base_word:end_word])
            rel = starts[lo:hi] - (base_word << 5)
        st = jnp.asarray(rel.astype(np.uint32))
        out = decode_ops.decode_block(dwords, st, lut, fc_lj, sp, syms, S, table_bits)
        out_parts.append(np.asarray(out).T.reshape(-1))  # stream-major
    flat = np.concatenate(out_parts) if len(out_parts) > 1 else out_parts[0]
    from glz_tpu.core.api import _verify
    return _verify(flat[: f.n_symbols].astype(np.uint8).tobytes(), f)
