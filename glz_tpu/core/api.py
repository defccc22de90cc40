"""High-level compress/decompress orchestration.

The reference's L4 layer is the template-pattern Compressor/Decompressor
(compressor.h:62-92) running a 4-phase encode (histogram -> code generation
-> header -> payload) and 2-phase decode (header -> payload).  Here the same
pipeline is a pure function over arrays, with interchangeable execution
backends: "host" (NumPy, always available) and "device" (JAX/Pallas block
kernels, glz_tpu.ops)."""

from __future__ import annotations

import numpy as np

from glz_tpu import config as cfg
from glz_tpu.core import bitio, container, host_codec
from glz_tpu.core.codebook import build_codebook, canonical_codebook, histogram_bytes


def _plan_streams(n_symbols: int, conf: cfg.GlzConfig) -> int:
    """Pick symbols-per-stream: honor conf.stream_symbols but cap stream
    count (size budget) and guarantee at least one stream."""
    if n_symbols == 0:
        return conf.stream_symbols
    s = conf.stream_symbols
    n_streams = -(-n_symbols // s)
    if n_streams > conf.max_streams:
        s = -(-n_symbols // conf.max_streams)
    return s


def compress_bytes_host(data: bytes | np.ndarray, conf: cfg.GlzConfig = cfg.DEFAULT,
                        codebook=None) -> bytes:
    """Byte-mode compression on the host backend (native C++ when built).

    codebook: optional pre-built shared Codebook (multi-host: every shard
    must encode with the same code so one container header serves all)."""
    from glz_tpu.utils import native

    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    if codebook is not None:
        cb = codebook
    else:
        freqs = histogram_bytes(arr)
        cb = build_codebook(freqs, conf.length_limit)
    stream_symbols = _plan_streams(arr.size, conf)
    nat = native.encode_bytes(arr, cb.left_justified_codes(), cb.lengths,
                              stream_symbols) if arr.size else None
    if nat is not None:
        payload, total_bits, stream_bits = nat
    else:
        words, total_bits, stream_bits = host_codec.encode_streams(arr, cb, stream_symbols)
        payload = bitio.words_to_bytes(words, total_bits)
    import zlib
    f = container.GlzFile(
        mode=cfg.MODE_BYTE,
        n_symbols=arr.size,
        stream_symbols=stream_symbols,
        stream_bits=stream_bits,
        codebook_blob=container.encode_byte_codebook(cb.lengths.astype(np.uint8)),
        payload=payload,
        checksum=zlib.crc32(arr.tobytes()) if conf.checksum else None,
    )
    return container.write_container(f)


def _verify(data: bytes, f) -> bytes:
    """crc32 integrity check when the container carries one (the reference
    has no integrity checking at all; SURVEY.md §5 failure detection)."""
    if f.checksum is not None:
        import zlib
        if zlib.crc32(data) & 0xFFFFFFFF != f.checksum:
            raise ValueError("checksum mismatch: corrupt container or decoder bug")
    return data


def decompress_bytes_host(blob: bytes, variant: str = cfg.DECODER_TABLE, table_bits: int = 16) -> bytes:
    from glz_tpu.utils import native

    f = container.read_container(blob)
    if f.mode != cfg.MODE_BYTE:
        raise ValueError("not a byte-mode container")
    if f.layout == container.LAYOUT_LOCKSTEP:
        from glz_tpu.models.canonical_byte import decompress_bytes_lockstep
        return decompress_bytes_lockstep(blob)
    lengths = container.decode_byte_codebook(f.codebook_blob)
    cb = canonical_codebook(lengths)
    if variant == cfg.DECODER_TABLE and f.n_symbols:
        lut, fc_lj, sp, syms_tbl = cb.decode_luts(table_bits)
        nat = native.decode_streams(f.payload, f.stream_bits, f.n_symbols,
                                    f.stream_symbols, lut, table_bits,
                                    fc_lj, sp, syms_tbl)
        if nat is not None:
            return _verify(nat.tobytes(), f)
    words = bitio.bytes_to_words(f.payload)
    syms = host_codec.decode_streams(
        words, f.stream_bits, f.n_symbols, f.stream_symbols, cb,
        table_bits=table_bits, variant=variant,
    )
    return _verify(syms.astype(np.uint8).tobytes(), f)


def compress(data: bytes, mode: int = cfg.MODE_BYTE, backend: str = "host",
             conf: cfg.GlzConfig = cfg.DEFAULT) -> bytes:
    """Compress `data` into a .glz container.

    conf.layout selects the payload layout: LAYOUT_BITSTREAM (host/XLA
    paths) or LAYOUT_LOCKSTEP (the Pallas throughput path, device backend
    implied).  All modes and layouts honor conf.checksum."""
    if mode == cfg.MODE_BYTE:
        if conf.layout == cfg.LAYOUT_LOCKSTEP:
            from glz_tpu.models.canonical_byte import compress_bytes_lockstep
            return compress_bytes_lockstep(data, conf)
        if backend == "device":
            from glz_tpu.models.canonical_byte import compress_bytes_device
            return compress_bytes_device(data, conf)
        return compress_bytes_host(data, conf)
    if mode == cfg.MODE_HUFFWORD:
        from glz_tpu.models.huffword import compress_huffword
        return compress_huffword(data, conf, backend=backend)
    if mode == cfg.MODE_NORMAL_TREE:
        from glz_tpu.models.normal_tree import compress_normal_tree
        return compress_normal_tree(data, conf)
    raise ValueError(f"unsupported mode {mode}")


def compress_batch(datas: list[bytes], mode: int = cfg.MODE_BYTE,
                   backend: str = "host",
                   conf: cfg.GlzConfig = cfg.DEFAULT,
                   pipeline: bool = True,
                   shared_codebook: bool = False) -> list[bytes]:
    """Compress independent inputs (the Silesia multi-file batch shape,
    BASELINE config 4).

    shared_codebook=False (default): each file gets its own codebook and
    container.  With pipeline=True two files are in flight at once on a
    thread pool: while file i's device kernels run (JAX dispatch releases
    the GIL at the blocking D2H), file i+1's host phases (histogram,
    codebook build, container assembly) execute on the other thread — the
    host/device overlap the r3 review found missing.  Results come back in
    input order; per-file containers are identical to the serial loop's.

    shared_codebook=True: ONE codebook is built from frequencies
    accumulated across the whole file list (the reference's multi-file
    accumulation via Tokenizer::reset + encoder reuse, tokenizer.h:105-116,
    compressor.h:53-55) and every container references it.  Each container
    still embeds the codebook and decodes independently; compress_archive
    emits it once for the total-size win."""
    if shared_codebook:
        return _compress_batch_shared(datas, mode, backend, conf, pipeline)
    return _pipelined(
        lambda d: compress(d, mode=mode, backend=backend, conf=conf),
        datas, pipeline)


def _pipelined(fn, datas, pipeline: bool) -> list[bytes]:
    """Per-file compress with the 2-deep host/device overlap (the same
    scheme the non-shared compress_batch uses)."""
    if len(datas) <= 1 or not pipeline:
        return [fn(d) for d in datas]
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        return list(ex.map(fn, datas))


def _compress_batch_shared(datas, mode, backend, conf,
                           pipeline: bool = True) -> list[bytes]:
    if mode == cfg.MODE_HUFFWORD:
        from glz_tpu.models.huffword import compress_huffword_shared
        return compress_huffword_shared(datas, conf, backend=backend,
                                        pipeline=pipeline)
    if mode != cfg.MODE_BYTE:
        raise ValueError("shared_codebook supports byte and huffword modes")
    from glz_tpu.core.codebook import sampled_histogram

    hist = np.zeros(256, np.int64)
    for d in datas:
        arr = np.frombuffer(d, np.uint8)
        hist += sampled_histogram(arr, conf.histogram_budget)
    if conf.layout == cfg.LAYOUT_LOCKSTEP:
        from glz_tpu.models.canonical_byte import compress_bytes_lockstep
        from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN
        limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
        cb = build_codebook(hist, limit)
        return _pipelined(lambda d: compress_bytes_lockstep(d, conf, codebook=cb),
                          datas, pipeline)
    cb = build_codebook(hist, conf.length_limit)
    if backend == "device":
        from glz_tpu.models.canonical_byte import compress_bytes_device
        return _pipelined(lambda d: compress_bytes_device(d, conf, codebook=cb),
                          datas, pipeline)
    return _pipelined(lambda d: compress_bytes_host(d, conf, codebook=cb),
                      datas, pipeline)


# ---- .glzb archive: shared-codebook batch with the codebook emitted ONCE --
#
# Entry containers are full .glz files whose codebook bytes are factored
# out: the archive stores the longest common SUFFIX of every container's
# codebook blob once (byte mode: the whole blob; huffword: everything
# after the per-file word_first byte), and each entry keeps only its
# per-file prefix.  Reconstruction is pure byte splicing, so every entry
# decodes through the ordinary container path.
#
# Layout (little-endian):
#   0:4  magic b"GLZB"; 4:1 version (1); 5:1 mode; 6:2 reserved
#   8:4  n_files (u32); 12:4 shared codebook size (u32); 16:.. shared blob
#   then per file: u32 prefix_len, u64 body_len, prefix, body
#   (body = the .glz container bytes with the codebook section removed)

ARCHIVE_MAGIC = b"GLZB"


def compress_archive(datas: list[bytes], mode: int = cfg.MODE_BYTE,
                     backend: str = "host",
                     conf: cfg.GlzConfig = cfg.DEFAULT) -> bytes:
    """Shared-codebook multi-file archive (.glzb): one codebook header for
    the whole corpus — n_files-1 fewer codebook copies than per-file
    containers, which is the reference's one-encoder-many-files size
    advantage (compressor.h:53-55) made explicit."""
    import struct

    blobs = compress_batch(datas, mode=mode, backend=backend, conf=conf,
                           shared_codebook=True)
    cbs = []
    for b in blobs:
        f = container.read_container(b)
        cbs.append(f.codebook_blob)
    # longest common suffix across all codebook blobs
    shared_len = min(len(c) for c in cbs) if cbs else 0
    for c in cbs[1:]:
        while shared_len and c[-shared_len:] != cbs[0][-shared_len:]:
            shared_len -= 1
    shared = cbs[0][-shared_len:] if shared_len else b""
    parts = [struct.pack("<4sBBHII", ARCHIVE_MAGIC, 1, mode, 0,
                         len(blobs), shared_len), shared]
    for b, c in zip(blobs, cbs):
        prefix = c[: len(c) - shared_len]
        cb_off = container.HEADER_SIZE
        body = b[:cb_off] + b[cb_off + len(c):]
        parts.append(struct.pack("<IQ", len(prefix), len(body)))
        parts.append(prefix)
        parts.append(body)
    return b"".join(parts)


def archive_peek_layout(blob: bytes | memoryview) -> int:
    """Payload layout of a .glzb archive's first entry without a full
    parse (the CLI decides whether to warm the device backend before
    unarchive — every entry of an archive shares one layout)."""
    import struct

    mv = memoryview(blob)
    if len(mv) < 16 or bytes(mv[:4]) != ARCHIVE_MAGIC:
        raise ValueError("not a .glzb archive")
    _m, _v, _mode, _r, n_files, shared_len = struct.unpack_from("<4sBBHII", mv, 0)
    if n_files == 0:
        return container.LAYOUT_BITSTREAM
    off = 16 + shared_len
    if off + 12 > len(mv):
        raise ValueError("corrupt .glzb archive: truncated before entry 0")
    plen, _blen = struct.unpack_from("<IQ", mv, off)
    off += 12 + plen
    return container.peek_layout(mv[off : off + container.HEADER_SIZE])


def decompress_archive(blob: bytes, backend: str = "host") -> list[bytes]:
    """Decode every file of a .glzb archive (the inverse of
    compress_archive); entries are reconstructed by splicing the shared
    codebook back and decoded through the ordinary container path."""
    import struct

    mv = memoryview(blob)
    if len(mv) < 16 or bytes(mv[:4]) != ARCHIVE_MAGIC:
        raise ValueError("not a .glzb archive")
    magic, version, mode, _r, n_files, shared_len = struct.unpack_from(
        "<4sBBHII", mv, 0)
    if version != 1:
        raise ValueError(f"unsupported .glzb version {version}")
    off = 16
    if off + shared_len > len(mv):
        raise ValueError("corrupt .glzb archive: truncated shared codebook")
    shared = bytes(mv[off : off + shared_len])
    off += shared_len
    out = []
    for k in range(n_files):
        if off + 12 > len(mv):
            raise ValueError(f"corrupt .glzb archive: truncated entry {k}")
        plen, blen = struct.unpack_from("<IQ", mv, off)
        off += 12
        if off + plen + blen > len(mv):
            raise ValueError(f"corrupt .glzb archive: truncated entry {k}")
        prefix = bytes(mv[off : off + plen])
        off += plen
        body = bytes(mv[off : off + blen])
        off += blen
        cb_off = container.HEADER_SIZE
        out.append(body[:cb_off] + prefix + shared + body[cb_off:])
    return decompress_batch(out, backend=backend)


def decompress_batch(blobs: list[bytes], backend: str = "host",
                     pipeline: bool = True) -> list[bytes]:
    """Batch decompress with the same 2-deep host/device pipelining as
    compress_batch (detokenize/CRC on one thread while the other's kernels
    run)."""
    return _pipelined(lambda b: decompress(b, backend=backend), blobs,
                      pipeline)


def decompress(blob: bytes, backend: str = "host",
               variant: str = cfg.DECODER_TABLE) -> bytes:
    """Decompress a .glz container (mode and layout are self-describing).

    variant=DECODER_DEVICE routes byte mode to the TPU block decoder
    regardless of `backend` (the fourth decoder strategy next to the
    reference's bitwalk/fast/table trio)."""
    f = container.read_container(blob)
    if f.mode == cfg.MODE_BYTE:
        if backend == "device" or variant == cfg.DECODER_DEVICE:
            from glz_tpu.models.canonical_byte import decompress_bytes_device
            return decompress_bytes_device(blob)
        return decompress_bytes_host(blob, variant=variant)
    if f.mode == cfg.MODE_HUFFWORD:
        from glz_tpu.models.huffword import decompress_huffword
        return decompress_huffword(blob, backend=backend, variant=variant)
    if f.mode == cfg.MODE_NORMAL_TREE:
        from glz_tpu.models.normal_tree import decompress_normal_tree
        return decompress_normal_tree(blob)
    raise ValueError(f"unsupported container mode {f.mode}")
