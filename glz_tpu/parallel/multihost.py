"""Multi-host orchestration (the reference has nothing distributed —
SURVEY.md §2 'Parallelism / distributed components').

Standard JAX pattern: every host runs the same program under
`jax.distributed.initialize`, the global mesh spans all hosts' chips, each
host feeds its local shard of the input, collectives ride ICI within hosts
and DCN across hosts, and host 0 assembles the file-order container.

All three gather recipes follow BASELINE config 5's "sizes first, then
padded payloads" shape: fixed-shape process_allgather of per-shard sizes,
then payloads padded to the max and trimmed on host 0.

Paths (selected by conf.layout / the entry point):
  * compress_bytes_multihost, bitstream layout — per-host native host
    encode, shared codebook via summed histograms, stream-table stitch;
  * compress_bytes_multihost, lockstep layout — per-host Pallas
    reverse-sweep encode (models/canonical_byte.compress_bytes_lockstep
    with the shared codebook); group segments are self-contained, so the
    stitch is a concatenation of group tables and payloads;
  * compress_huffword_multihost — per-host tokenize + vocab build, global
    vocab union via process_allgather of per-class token blobs, shared
    dual codebooks, per-host lockstep token encode, group-table stitch.

Multihost containers honor conf.checksum: each host crc32s its own shard
and host 0 stitches the per-shard crcs into the whole-file checksum with
utils/crc.crc32_combine (GF(2) matrix composition — host 0 never sees the
original bytes).

CPU simulation for CI: run N processes with JAX_PLATFORMS=cpu and
jax.distributed; tests/test_multihost.py covers round trips plus the
must-fail misorder/misalignment cases for every path.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from glz_tpu.parallel import mesh as pmesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op for single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "data") -> jax.sharding.Mesh:
    return pmesh.make_mesh(len(jax.devices()), axis_names=(axis_name,))


def _allgather(vec) -> np.ndarray:
    """Fixed-shape process_allgather of a small int vector -> [nproc, k]
    of int64.

    64-bit values are split into two u32 halves before the jnp round trip:
    jnp.asarray silently truncates int64 to int32 under JAX's default
    x64-disabled config, which would wrap shard byte counts at 2 GiB and
    corrupt the stitched container (r4 advisor, medium)."""
    from jax.experimental import multihost_utils

    v = np.asarray(vec, np.int64)
    if v.size and int(v.min()) < 0:
        raise ValueError(f"_allgather expects non-negative sizes, got {v}")
    halves = np.stack([(v & 0xFFFFFFFF).astype(np.uint32),
                       (v >> 32).astype(np.uint32)])
    g = np.asarray(multihost_utils.process_allgather(jnp.asarray(halves)))
    return (g[:, 1].astype(np.int64) << 32) | g[:, 0].astype(np.int64)


def _gather_ragged(arr: np.ndarray) -> list[np.ndarray]:
    """Ragged per-process arrays -> list of nproc trimmed arrays (sizes
    first, then a padded fixed-shape allgather).  64-bit dtypes ride the
    wire as u32 pairs (same int64-truncation hazard as _allgather)."""
    from jax.experimental import multihost_utils

    arr = np.ascontiguousarray(arr)
    wide = arr.dtype.itemsize == 8
    send = arr.view(np.uint32) if wide else arr
    sizes = _allgather([send.shape[0]])[:, 0]
    m = int(sizes.max())
    pad = np.zeros(m, send.dtype)
    pad[: send.shape[0]] = send
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(pad)))
    parts = [np.ascontiguousarray(gathered[p, : int(sizes[p])])
             for p in range(sizes.shape[0])]
    if wide:
        parts = [p.view(arr.dtype) for p in parts]
    return parts


def compress_bytes_multihost(local_data: bytes, conf=None, stream_symbols: int = 1 << 18):
    """Each host compresses its local shard with a shared codebook; host 0
    stitches the in-order container.  conf.layout selects the bitstream
    (host encode) or lockstep (Pallas kernel) path."""
    from glz_tpu import config as cfg

    conf = conf or cfg.GlzConfig(stream_symbols=stream_symbols)
    if jax.process_count() == 1:
        from glz_tpu.core.api import compress
        return compress(local_data, conf=conf)
    if conf.layout == cfg.LAYOUT_LOCKSTEP:
        return _compress_bytes_lockstep_multihost(local_data, conf)
    return _compress_bytes_bitstream_multihost(local_data, conf)


def _stitched_checksum(local_data: bytes, conf) -> int | None:
    """Whole-file crc32 from per-shard crc32s (every process computes and
    gathers; host 0 uses the combined value).  Returns None when
    conf.checksum is off — callers pass the result straight to GlzFile."""
    if not getattr(conf, "checksum", False):
        return None
    import zlib

    from glz_tpu.utils.crc import crc32_concat

    meta = _allgather([zlib.crc32(local_data) & 0xFFFFFFFF, len(local_data)])
    return crc32_concat(meta[:, 0], meta[:, 1])


def _shared_byte_codebook(local_data: bytes, limit):
    """psum of local histograms across hosts + deterministic construction
    everywhere (the "broadcast codebook" of BASELINE config 5)."""
    from glz_tpu.core.codebook import build_codebook, histogram_bytes

    local_hist = histogram_bytes(np.frombuffer(local_data, np.uint8))
    global_hist = _allgather(local_hist).sum(axis=0)
    return build_codebook(global_hist.astype(np.int64), limit)


def _validate_shards(n_local: int, align: int, what: str) -> None:
    """Allgather-first shard validation: every process sees every shard's
    size and raises the SAME error, so a bad shard fails the whole job
    cleanly instead of leaving the healthy hosts blocked inside the next
    collective while one process exits early."""
    meta = _allgather([n_local, n_local % align])
    empty = np.flatnonzero(meta[:, 0] == 0)
    if empty.size:
        raise ValueError(
            f"host {int(empty[0])} got an empty shard; every process must "
            f"hold at least one {what} ({align} symbols) — an empty shard "
            "would insert a phantom zero-length unit into the stitched "
            "table and desynchronize every later shard")
    mis = np.flatnonzero(meta[:-1, 1] != 0)
    if mis.size:
        bad = int(mis[0])
        raise ValueError(
            f"shard of {int(meta[bad, 0])} bytes on host {bad} is not a "
            f"multiple of the {what} ({align}); align shard boundaries "
            f"(only the last host may hold a partial {what.split()[0]})")


def _compress_bytes_bitstream_multihost(local_data: bytes, conf):
    from glz_tpu.core import container
    from glz_tpu.core.api import compress_bytes_host

    # The stitched container records one global stream_symbols and the
    # decoder maps stream k to symbols [k*S, (k+1)*S); a non-last shard
    # whose size is not a multiple of S would end with a short stream and
    # silently desynchronize every later shard — reject it loudly.
    _validate_shards(len(local_data), conf.stream_symbols,
                     f"stream (stream_symbols={conf.stream_symbols})")

    cb = _shared_byte_codebook(local_data, conf.length_limit)
    checksum = _stitched_checksum(local_data, conf)
    # local shard containers are intermediates: skip their per-shard crc
    # (the stitched container carries the combined one)
    local_blob = compress_bytes_host(
        local_data, dataclasses.replace(conf, checksum=False), codebook=cb)

    f = container.read_container(local_blob)
    meta = _allgather([f.n_symbols])
    payloads = _gather_ragged(np.frombuffer(f.payload, np.uint8))
    tables = _gather_ragged(f.stream_bits.astype(np.int64))

    if jax.process_index() != 0:
        return None
    # host 0: stitch shards in process order (file order)
    parts = []
    bits_tables = []
    n_total = 0
    for p in range(jax.process_count()):
        body = payloads[p]
        tbl = tables[p].astype(np.uint64)
        # inflate the shard's last stream advance to the byte-aligned size
        tbl[-1] += body.size * 8 - int(tbl.sum())
        parts.append(body.tobytes())
        bits_tables.append(tbl)
        n_total += int(meta[p, 0])
    g = container.GlzFile(
        mode=f.mode,
        n_symbols=n_total,
        stream_symbols=f.stream_symbols,
        stream_bits=np.concatenate(bits_tables),
        codebook_blob=f.codebook_blob,  # identical on every host (shared code)
        payload=b"".join(parts),
        checksum=checksum,
    )
    return container.write_container(g)


def _compress_bytes_lockstep_multihost(local_data: bytes, conf):
    """Lockstep (layout-2) multihost: the flagship Pallas path per shard.

    Group segments are self-contained runs of consumption-ordered words
    whose lengths the group table records, so host 0's stitch is a pure
    concatenation — group starts fall out of the cumsum at decode time
    (models/canonical_byte.decompress_bytes_lockstep).  Replaces the
    reference's single serial stream (canonical_huff_encoder.cc:270-285)
    at the multi-host scale axis."""
    from glz_tpu.core import container
    from glz_tpu.core.lockstep import LANES
    from glz_tpu.models.canonical_byte import (
        _lockstep_stream_symbols, compress_bytes_lockstep)
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN

    S = _lockstep_stream_symbols(conf)
    group_syms = conf.group_rows * LANES * S
    # group geometry is global: group g covers symbols [g*G*S, (g+1)*G*S)
    # of the FILE, so every non-last shard must hold whole groups
    _validate_shards(len(local_data), group_syms,
                     f"lockstep group (group_rows*128*stream_symbols="
                     f"{group_syms} bytes)")

    limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    cb = _shared_byte_codebook(local_data, limit)
    checksum = _stitched_checksum(local_data, conf)
    local_blob = compress_bytes_lockstep(
        local_data, dataclasses.replace(conf, checksum=False), codebook=cb)

    f = container.read_container(local_blob)
    meta = _allgather([f.n_symbols])
    words = _gather_ragged(np.frombuffer(f.payload, "<u4").astype(np.uint32))
    tables = _gather_ragged(f.stream_bits.astype(np.int64))

    if jax.process_index() != 0:
        return None
    n_total = int(meta[:, 0].sum())
    g = container.GlzFile(
        mode=f.mode,
        n_symbols=n_total,
        stream_symbols=S,
        stream_bits=np.concatenate(tables).astype(np.uint64),
        codebook_blob=f.codebook_blob,
        payload=np.concatenate(words).astype("<u4").tobytes(),
        layout=container.LAYOUT_LOCKSTEP,
        group_rows=f.group_rows,
        checksum=checksum,
    )
    return container.write_container(g)


def decompress_bytes_multihost(blob: bytes):
    """Shard-parallel decode of a lockstep byte container: process k
    decodes its contiguous range of groups and returns (local_bytes,
    byte_offset) — the file-order inverse of compress_bytes_multihost's
    stitch.  Callers write local_bytes at byte_offset into shared storage
    (each host owns a disjoint range; no gather of the decoded bytes is
    needed or wanted at scale).

    Group segments are self-contained (consumption-ordered words whose
    lengths the group table records), so the local work is just a
    sub-container decode through the ordinary Pallas path.  Bitstream
    (layout-0) containers are bit-stitched with no byte-aligned shard
    points — decode those in one process via api.decompress.

    The container-level crc32 covers the whole file, which no single
    process holds; the caller should verify it over the assembled output
    (zlib.crc32 of the final file vs container.read_container(blob)
    .checksum) when integrity matters."""
    from glz_tpu import config as cfg
    from glz_tpu.core import container
    from glz_tpu.models.canonical_byte import decompress_bytes_lockstep

    f = container.read_container(blob)
    if f.mode != cfg.MODE_BYTE or f.layout != container.LAYOUT_LOCKSTEP:
        raise ValueError(
            "multihost decompress supports lockstep byte containers; "
            "decode other containers in one process via glz_tpu.decompress")
    nproc, pid = jax.process_count(), jax.process_index()
    n_groups = f.n_streams
    gs = f.group_rows * 128 * f.stream_symbols
    g0 = n_groups * pid // nproc
    g1 = n_groups * (pid + 1) // nproc
    byte0 = g0 * gs
    n_local = max(0, min(f.n_symbols, g1 * gs) - byte0)
    if n_local == 0:
        return b"", byte0
    words = np.frombuffer(f.payload, "<u4")
    gw = f.stream_bits.astype(np.int64)
    starts = np.cumsum(gw) - gw
    lo_w = int(starts[g0])
    hi_w = int(starts[g1 - 1] + gw[g1 - 1])
    sub = container.GlzFile(
        mode=f.mode,
        n_symbols=n_local,
        stream_symbols=f.stream_symbols,
        stream_bits=f.stream_bits[g0:g1],
        codebook_blob=f.codebook_blob,
        payload=words[lo_w:hi_w].tobytes(),
        layout=container.LAYOUT_LOCKSTEP,
        group_rows=f.group_rows,
    )
    return decompress_bytes_lockstep(container.write_container(sub)), byte0


def decompress_huffword_multihost(blob: bytes):
    """Shard-parallel decode of a lockstep huffword container: process k
    decodes its contiguous group range (token parity is preserved because
    group boundaries sit at even token indices) and detokenizes locally;
    byte offsets come from one allgather of the local output sizes — token
    byte lengths vary, so offsets are only known after decoding.

    Returns (local_bytes, byte_offset); callers write each host's slice at
    its offset, as with decompress_bytes_multihost."""
    from glz_tpu import config as cfg
    from glz_tpu.core import container
    from glz_tpu.models.huffword import decompress_huffword

    f = container.read_container(blob)
    if f.mode != cfg.MODE_HUFFWORD or f.layout != container.LAYOUT_LOCKSTEP:
        raise ValueError(
            "multihost decompress supports lockstep huffword containers; "
            "decode other containers in one process via glz_tpu.decompress")
    nproc, pid = jax.process_count(), jax.process_index()
    n_groups = f.n_streams
    gs = f.group_rows * 128 * f.stream_symbols
    g0 = n_groups * pid // nproc
    g1 = n_groups * (pid + 1) // nproc
    t0 = g0 * gs
    n_local = max(0, min(f.n_symbols, g1 * gs) - t0)
    if n_local == 0:
        local = b""
    else:
        words = np.frombuffer(f.payload, "<u4")
        gw = f.stream_bits.astype(np.int64)
        starts = np.cumsum(gw) - gw
        lo_w = int(starts[g0])
        hi_w = int(starts[g1 - 1] + gw[g1 - 1])
        sub = container.GlzFile(
            mode=f.mode,
            n_symbols=n_local,
            stream_symbols=f.stream_symbols,
            stream_bits=f.stream_bits[g0:g1],
            codebook_blob=f.codebook_blob,  # word_first = class of token 0;
                                            # t0 is even, so it holds locally
            payload=words[lo_w:hi_w].tobytes(),
            layout=container.LAYOUT_LOCKSTEP,
            group_rows=f.group_rows,
        )
        local = decompress_huffword(container.write_container(sub))
    sizes = _allgather([len(local)])[:, 0]
    return local, int(sizes[:pid].sum())


# ---- HuffWord multihost ----------------------------------------------------

def huffword_multihost_rows(conf) -> int:
    """Group rows for the huffword multihost path: conf.group_rows capped
    LOUDLY (models/huffword._capped_rows — the same warn-on-clamp every
    lockstep entry point uses) by the dual kernel's non-pack2 VMEM bound,
    which is known before the vocabulary union (the single-process path
    can use the laxer pack2 bound because it sees the vocab sizes
    first)."""
    from glz_tpu.models.huffword import _capped_rows, _huffword_stream_tokens

    S = _huffword_stream_tokens(conf)
    return _capped_rows(conf.group_rows, S, pack2=False)


def split_huffword_shards(data: bytes, nproc: int, conf=None) -> list[int]:
    """Byte offsets [0, ..., len(data)] giving nproc shards that satisfy
    compress_huffword_multihost's alignment contract: every cut sits at a
    global token boundary whose index is a multiple of rows*128*S and
    whose first byte re-tokenizes context-freely (not a glue character
    followed by an alnum — the one case where a suffix tokenization could
    diverge from the global one, utils/tokenizer.wordlike_mask).  S and
    rows are derived from `conf` exactly as compress_huffword_multihost
    derives them, so planner and compressor cannot disagree on group
    geometry (r4 advisor low #3).

    Intended for drivers that hold the whole file (e.g. host 0 planning the
    shard map it hands out); each host then tokenizes only its own shard.
    """
    from glz_tpu import config as cfg
    from glz_tpu.core.lockstep import LANES
    from glz_tpu.models.huffword import _huffword_stream_tokens
    from glz_tpu.utils import tokenizer as tok

    conf = conf or cfg.GlzConfig()
    S = _huffword_stream_tokens(conf)
    rows = huffword_multihost_rows(conf)

    starts, _, _ = tok.tokenize(data)
    T = starts.size
    group_syms = rows * LANES * S
    glue = frozenset(b"'-_")

    def clean(t: int) -> bool:
        p = int(starts[t])
        if data[p] in glue and p + 1 < len(data) and tok._ALNUM[data[p + 1]]:
            return False
        return True

    bounds = [0]
    prev_t = 0
    for k in range(1, nproc):
        t = T * k // nproc // group_syms * group_syms
        while t > prev_t and not clean(t):
            t -= group_syms
        if t <= prev_t:
            raise ValueError(
                f"cannot split {len(data)} bytes ({T} tokens) into {nproc} "
                f"group-aligned huffword shards at group size {group_syms}; "
                "use fewer hosts or a smaller stream_symbols")
        bounds.append(int(starts[t]))
        prev_t = t
    bounds.append(len(data))
    return bounds


def compress_huffword_multihost(local_data: bytes, conf=None):
    """HuffWord lockstep multihost (BASELINE config 5's recipe applied to
    config 3's codec): per-host tokenize + vocab build, vocab union via
    process_allgather of per-class token blobs, shared dual codebooks,
    per-host Pallas token encode, host-0 group-table stitch.

    Alignment contract (validated via allgather, raises on violation):
    every non-last shard's token count must be a multiple of the group
    token count (huffword_multihost_rows(conf) * 128 * S), and every
    shard's first token class must match shard 0's (strict global
    word/non-word alternation then follows from the even group size).
    split_huffword_shards produces compliant offsets."""
    from glz_tpu import config as cfg
    from glz_tpu.core import container
    from glz_tpu.core.codebook import build_codebook
    from glz_tpu.models.huffword import (
        _huffword_stream_tokens, encode_lockstep_tokens, huffword_cb_blob)
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN
    from glz_tpu.utils import tokenizer as tok

    conf = conf or cfg.GlzConfig()
    if jax.process_count() == 1:
        from glz_tpu.core.api import compress
        return compress(local_data, mode=cfg.MODE_HUFFWORD, backend="device",
                        conf=conf)

    S = _huffword_stream_tokens(conf)
    rows = huffword_multihost_rows(conf)
    group_syms = rows * 128 * S
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(local_data)
    T = ids.size

    # allgather-first validation: every process sees every shard's state
    # and raises the same error (a local raise would leave the other
    # hosts blocked inside the next collective)
    pid, nproc = jax.process_index(), jax.process_count()
    meta = _allgather([T, T % group_syms, 1 if word_first else 0])
    empty = np.flatnonzero(meta[:, 0] == 0)
    if empty.size:
        raise ValueError(
            f"host {int(empty[0])} got an empty shard; every process must "
            f"hold at least one huffword lockstep group ({group_syms} "
            f"tokens at stream_symbols={S})")
    if int((meta[:-1, 1] != 0).sum()):
        bad = int(np.flatnonzero(meta[:-1, 1] != 0)[0])
        raise ValueError(
            f"shard on host {bad} holds {int(meta[bad, 0])} tokens, not a "
            f"multiple of the lockstep group size {group_syms}; use "
            "split_huffword_shards to plan group-aligned shard offsets")
    if int((meta[:, 2] != meta[0, 2]).sum()):
        raise ValueError(
            "shard first-token classes disagree across hosts — global "
            "word/non-word alternation would break; use "
            "split_huffword_shards to plan shard offsets")
    word_first = bool(meta[0, 2])

    # ---- vocab union: gather each class's (token text, lengths, counts),
    # then one vectorized (length, content) merge (tokenizer.
    # merge_vocab_parts — the per-entry Python loop the r4 review flagged
    # scaled O(vocab * nproc) in interpreter time)
    union_vocabs = []
    id_maps = []
    for v in (wv, nv):
        tok_lens = np.diff(v.offsets).astype(np.int64)
        blob_parts = _gather_ragged(np.frombuffer(v.blob, np.uint8))
        len_parts = _gather_ragged(tok_lens)
        cnt_parts = _gather_ragged(v.counts.astype(np.int64))
        union, maps = tok.merge_vocab_parts(blob_parts, len_parts, cnt_parts)
        union_vocabs.append(union)
        id_maps.append(maps[pid])
    uwv, unv = union_vocabs

    limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    cbs = [build_codebook(uwv.counts, limit), build_codebook(unv.counts, limit)]

    # ---- remap local ids into the union vocabs, then encode the shard.
    # Shard token offsets are multiples of the (even) group size, so local
    # parity == global parity and word_first is global.
    if T:
        is_word = (np.arange(T) % 2 == 0) == word_first
        gids = np.where(is_word,
                        id_maps[0][np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                        id_maps[1][np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0)
    else:
        gids = np.zeros(0, np.int64)
    payload, group_counts = encode_lockstep_tokens(
        gids, T, word_first, cbs, uwv.n, unv.n, S, rows=rows)

    checksum = _stitched_checksum(local_data, conf)
    words = _gather_ragged(payload.astype(np.uint32))
    tables = _gather_ragged(group_counts.astype(np.int64))

    if pid != 0:
        return None
    f = container.GlzFile(
        mode=cfg.MODE_HUFFWORD,
        n_symbols=int(meta[:, 0].sum()),
        stream_symbols=S,
        stream_bits=np.concatenate(tables).astype(np.uint64),
        codebook_blob=huffword_cb_blob(word_first, uwv, unv, cbs),
        payload=np.concatenate(words).astype("<u4").tobytes(),
        layout=container.LAYOUT_LOCKSTEP,
        group_rows=rows,
        checksum=checksum,
    )
    return container.write_container(f)
