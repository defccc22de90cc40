"""HuffWord codec — word-based canonical Huffman with dual dictionaries.

Capability parity with the reference's CanonicalHuffEncoder<std::string>
(canonical_huffword.h): tokens strictly alternate between a word and a
non-word dictionary, each dictionary gets its own canonical code, and the
container is self-describing.  Differences (TPU-first redesign):

  * symbol ids are lexicographic ranks, not hash-map iteration order, so
    codebooks are deterministic (canonical_huffword.h:191 iterates an
    unordered_map);
  * the header stores code-length tables + token text (no Boost archive,
    canonical_huffword.h:311-358 — and far smaller);
  * no EOF pseudo-symbols ("\\xff" entries, encoder.h:188-197): the block
    container records token counts, so no end-mark is needed and the
    word-ending-in-hyphen end-mark bug (canonical_huffword.h:411-424) is
    structurally impossible;
  * the payload is split into fixed-token-count streams decoded in
    parallel; a stream's starting dictionary is determined by its first
    token's index parity.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

from glz_tpu import config as cfg
from glz_tpu.core import bitio, container
from glz_tpu.core.codebook import Codebook, build_codebook, canonical_codebook
from glz_tpu.utils import tokenizer as tok


def _encode_dict_blob(vocab: tok.TokenVocab, lengths: np.ndarray) -> bytes:
    n = vocab.n
    tok_lens = np.diff(vocab.offsets).astype("<u4")
    return (struct.pack("<I", n)
            + lengths.astype(np.uint8).tobytes()
            + tok_lens.tobytes()
            + vocab.blob)


def _corrupt(what: str):
    raise ValueError(f"corrupt .glz container: huffword codebook blob {what}")


def _decode_dict_blob(mv: memoryview, off: int):
    """Parse one dictionary's (lengths, token-length, token-text) section.

    Every count is validated against the blob size before use so a corrupt
    or truncated container fails with a clean ValueError instead of a numpy
    buffer error or silently garbled detokenization (r3 review weak #2)."""
    if len(mv) - off < 4:
        _corrupt("truncated before dictionary size")
    (n,) = struct.unpack_from("<I", mv, off)
    off += 4
    if 5 * n > len(mv) - off:
        _corrupt(f"claims {n} tokens but only {len(mv) - off} bytes remain")
    lengths = np.frombuffer(mv, dtype=np.uint8, count=n, offset=off).astype(np.int32)
    off += n
    if int(lengths.max(initial=0)) > 32:
        _corrupt("has a code length > 32")
    tok_lens = np.frombuffer(mv, dtype="<u4", count=n, offset=off).astype(np.int64)
    off += 4 * n
    total = int(tok_lens.sum())
    if total > len(mv) - off:
        _corrupt(f"token text claims {total} bytes but only "
                 f"{len(mv) - off} remain")
    blob = bytes(mv[off : off + total])
    off += total
    offsets = np.concatenate([[0], np.cumsum(tok_lens)])
    return lengths, offsets, blob, off


@functools.lru_cache(maxsize=1)
def _device_fns():
    """Module-level jitted helpers for the device path (built lazily so the
    host-only path never imports jax).  Hoisted out of the compress/
    decompress bodies so the jit cache is keyed on stable function objects —
    per-call closures would retrace on every invocation (r3 advisor)."""
    import jax
    import jax.numpy as jnp

    from glz_tpu.ops import pallas_decode as pd
    from glz_tpu.ops.pallas_lut import LANES, MAX_LUT_ROWS, lut_table

    def _gather(tbl, idx, interpret):
        # XLA's general gather is ~84M elem/s on TPU; route tables that fit
        # the Pallas row-select chain (<= 64K entries — the pack2 case)
        # through lut_table instead (r5: both huffword codec directions
        # were dominated by this take at ~0.45 s per 49M tokens)
        if tbl.shape[0] <= MAX_LUT_ROWS * LANES:
            return lut_table(idx, tbl, interpret=interpret)
        return jnp.take(tbl, idx, mode="clip")

    @functools.partial(jax.jit, static_argnames=("even_is_dict0", "interpret"))
    def gather_entries(ids_d, tbl, lo, n0, T, *, even_is_dict0: bool,
                       interpret: bool = False):
        # global position: dispatch boundaries are group-aligned (even), so
        # chunk-local parity == global parity, but the validity mask needs
        # the global offset
        pos = jnp.arange(ids_d.shape[0], dtype=jnp.int32)
        in_dict0 = (pos % 2 == 0) if even_is_dict0 else (pos % 2 == 1)
        idx = jnp.minimum(ids_d.astype(jnp.int32) + jnp.where(in_dict0, 0, n0),
                          jnp.int32(tbl.shape[0] - 1))
        ent = _gather(tbl, idx, interpret)
        return jnp.where(lo + pos < T, ent, jnp.uint32(0))

    @functools.partial(jax.jit, static_argnames=("S", "small", "rows",
                                                 "interpret"))
    def map_ranks(ranks_d, tbl, n_even, *, S: int, small: bool, rows: int,
                  interpret: bool = False):
        flat = (pd.unpack_ranks_packed(ranks_d, S, rows) if small
                else pd.unpack_ranks(ranks_d, S, rows))
        pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
        idx = jnp.minimum(flat.astype(jnp.int32) + jnp.where(pos % 2 == 0, 0,
                                                             n_even),
                          jnp.int32(tbl.shape[0] - 1))
        out = _gather(tbl, idx, interpret)
        return out.astype(jnp.uint16) if small else out

    return gather_entries, map_ranks


def _gather_entries_device(ids_d, tbl, lo, n0, T, *, even_is_dict0: bool):
    import jax

    return _device_fns()[0](ids_d, tbl, lo, n0, T, even_is_dict0=even_is_dict0,
                            interpret=jax.default_backend() == "cpu")


def _map_ranks_device(ranks_d, tbl, n_even, *, S: int, small: bool,
                      rows: int = 8):
    import jax

    return _device_fns()[1](ranks_d, tbl, n_even, S=S, small=small, rows=rows,
                            interpret=jax.default_backend() == "cpu")


# stream_symbols values of the byte-oriented presets: for huffword they mean
# "no token-count preference was expressed", not an explicit request.
_BYTE_PRESET_S = {cfg.DEFAULT.stream_symbols, cfg.THROUGHPUT.stream_symbols,
                  cfg.RATIO.stream_symbols}
_HUFFWORD_DEFAULT_S = 512


def huffword_rows_cap(S: int, pack2: bool) -> int:
    """The dual decode kernel's VMEM bound on group_rows — the ONE source
    of truth for both the single-process device path and the multihost
    planner (parallel/multihost.huffword_multihost_rows), which must agree
    on group geometry or the stitched containers desynchronize (r4 review
    weak #7).

    The kernel's u32 rank output block is (S//2 with pack2 else S) * rows *
    512 B and must stay <= 4 MiB next to the payload window."""
    return max(8, ((1 << 14) if pack2 else (1 << 13)) // S)


def _capped_rows(rows: int, S: int, pack2: bool) -> int:
    """Apply huffword_rows_cap LOUDLY (r4 review weak #3: silent geometry
    downgrades) — every lockstep entry point routes through this."""
    cap = huffword_rows_cap(S, pack2)
    if rows > cap:
        import warnings
        warnings.warn(
            f"huffword lockstep group_rows={rows} exceeds the dual kernel's "
            f"VMEM budget at stream_symbols={S} "
            f"({'pack2' if pack2 else 'u32-rank'} path); using group_rows="
            f"{cap} — lower stream_symbols to use wider groups",
            stacklevel=3)
        rows = cap
    return rows


def _huffword_stream_tokens(conf: cfg.GlzConfig) -> int:
    """Tokens per lockstep stream for the device path.  Kept <= 1024 so the
    kernel's u32 rank output block (S * 4 KiB) stays inside VMEM.

    An explicitly configured stream_symbols outside that range raises (byte
    lockstep does the same, canonical_byte._lockstep_stream_symbols);
    the byte presets' defaults carry no huffword intent and select 512."""
    S = conf.stream_symbols
    if S & (S - 1) == 0 and 64 <= S <= 1024:
        return S
    if S in _BYTE_PRESET_S:
        return _HUFFWORD_DEFAULT_S
    raise ValueError(
        f"huffword device layout needs stream_symbols a power of two in "
        f"[64, 1024], got {S}")


def compress_huffword(data: bytes, conf: cfg.GlzConfig = cfg.DEFAULT,
                      backend: str = "host") -> bytes:
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(data)
    T = ids.size

    # A lockstep/device request is always honored — empty dictionaries
    # (possible only for T <= 1: tokens strictly alternate) ride the dual
    # kernel with an empty codebook rather than silently falling back to a
    # bitstream container (r4 review weak #3).
    if backend == "device" or conf.layout == cfg.LAYOUT_LOCKSTEP:
        return _compress_huffword_device(data, conf, word_first, wv, nv, ids)

    cbs: list[Codebook] = []
    for v in (wv, nv):
        freqs = v.counts if v.n else np.zeros(1, np.int64)
        cbs.append(build_codebook(freqs, conf.length_limit))
    return _bitstream_container(data, conf, T, word_first, wv, nv, ids, cbs)


def _bitstream_container(data, conf, T, word_first, wv, nv, ids, cbs) -> bytes:
    """Layout-0 huffword container from (class-local token ids, vocabs,
    codebooks) — the host encode shared by compress_huffword and the
    shared-codebook batch (union vocabs + union ids slot in directly)."""
    # per-token (code, len) via vectorized dict gather
    is_word = (np.arange(T) % 2 == 0) == word_first
    codes = np.where(is_word, cbs[0].codewords[np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                     cbs[1].codewords[np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0).astype(np.uint64)
    lens = np.where(is_word, cbs[0].lengths[np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                    cbs[1].lengths[np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0).astype(np.uint64)

    stream_tokens = min(conf.stream_symbols, 1 << 14)
    n_streams = max(1, -(-T // stream_tokens)) if T else 1
    if n_streams > conf.max_streams:
        stream_tokens = -(-T // conf.max_streams)
        n_streams = -(-T // stream_tokens)

    from glz_tpu.utils import native
    nat = None
    if T:
        lj = [cb.left_justified_codes() if cb.lengths.size else np.zeros(1, np.uint32) for cb in cbs]
        ln8 = [cb.lengths.astype(np.uint8) if cb.lengths.size else np.zeros(1, np.uint8) for cb in cbs]
        nat = native.encode_tokens(ids.astype(np.uint32), 0 if word_first else 1,
                                   lj[0], ln8[0], lj[1], ln8[1], stream_tokens)
    if nat is not None:
        payload_bytes_, total_bits, stream_bits = nat
    else:
        words, total_bits = bitio.pack_codes_msb(codes, lens)
        payload_bytes_ = bitio.words_to_bytes(words, total_bits)
        if T:
            bounds = np.arange(1, n_streams) * stream_tokens
            stream_bits = (np.add.reduceat(lens, np.concatenate([[0], bounds]))
                           if n_streams > 1 else np.asarray([lens.sum()]))
        else:
            stream_bits = np.zeros(1, np.uint64)

    checksum = None
    if conf.checksum:
        import zlib
        checksum = zlib.crc32(data)
    f = container.GlzFile(
        mode=cfg.MODE_HUFFWORD,
        n_symbols=T,
        stream_symbols=stream_tokens,
        stream_bits=stream_bits.astype(np.uint64),
        codebook_blob=huffword_cb_blob(word_first, wv, nv, cbs),
        payload=payload_bytes_,
        checksum=checksum,
    )
    return container.write_container(f)


def encode_lockstep_tokens(ids: np.ndarray, T: int, word_first: bool,
                           cbs, n_word: int, n_nonword: int, S: int,
                           rows: int = 8):
    """Shared-vocab token ids -> (payload u32 np, padded group word counts).

    The reverse-sweep Pallas kernel path: the device gathers each token's
    fused lj|len entry word from its parity dictionary (replacing the
    reference's per-token hash lookup + serial write_bits,
    canonical_huffword.h:374-433) and packs the consumption-order payload.
    Streams hold S tokens with S even, so token parity == step parity and
    the decoder can swap dictionaries per step (see pallas_decode.py).
    Single-process and multihost lockstep paths both land here; for
    multihost, T must be a multiple of rows*128*S on non-last shards
    so group geometry is global."""
    import jax
    import jax.numpy as jnp

    from glz_tpu.core.lockstep import LANES
    from glz_tpu.models.canonical_byte import LOCKSTEP_DISPATCH, _round_up
    from glz_tpu.ops.pallas_encode import encode_payload_from_entries

    group_syms = rows * LANES * S
    ent_tbls = [cb.left_justified_codes() | cb.lengths.astype(np.uint32)
                for cb in cbs]
    padded_T = _round_up(max(T, 1), group_syms)
    n0 = max(n_word, 1)
    combined_tbl = jnp.asarray(np.concatenate(
        [ent_tbls[0] if n_word else np.zeros(1, np.uint32),
         ent_tbls[1] if n_nonword else np.zeros(1, np.uint32)]))
    small = max(n_word, n_nonword) <= 0xFFFF
    ids_pad = np.zeros(padded_T, np.uint16 if small else np.uint32)
    ids_pad[:T] = ids.astype(ids_pad.dtype)

    interpret = jax.default_backend() == "cpu"
    dispatch = _round_up(min(LOCKSTEP_DISPATCH, padded_T), group_syms)
    payload_parts: list[np.ndarray] = []
    counts_parts: list[np.ndarray] = []
    for lo in range(0, padded_T, dispatch):
        chunk = _gather_entries_device(
            jnp.asarray(ids_pad[lo : lo + dispatch]), combined_tbl,
            jnp.int32(lo), jnp.int32(n0), jnp.int32(T),
            even_is_dict0=bool(word_first))
        payload, group_counts = encode_payload_from_entries(
            chunk, S, interpret=interpret, rows=rows)
        total = int(group_counts.sum())
        payload_parts.append(np.asarray(payload[:total]).astype(np.uint32))
        counts_parts.append(group_counts)
    return np.concatenate(payload_parts), np.concatenate(counts_parts)


def huffword_cb_blob(word_first: bool, wv, nv, cbs) -> bytes:
    return (struct.pack("<B", 1 if word_first else 0)
            + _encode_dict_blob(wv, cbs[0].lengths if wv.n else np.zeros(0))
            + _encode_dict_blob(nv, cbs[1].lengths if nv.n else np.zeros(0)))


def _compress_huffword_device(data: bytes, conf: cfg.GlzConfig,
                              word_first: bool, wv, nv, ids) -> bytes:
    """HuffWord lockstep device path (BASELINE config 3)."""
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN

    T = ids.size
    S = _huffword_stream_tokens(conf)
    rows = conf.group_rows
    if rows not in (8, 16, 32, 64):
        raise ValueError(f"group_rows must be 8, 16, 32 or 64, got {rows}")
    # cap by the dual kernel's VMEM budget (huffword_rows_cap) — loudly,
    # matching byte-mode's S validation (r4 review weak #3): the request is
    # honored as far as the hardware budget allows and the caller is told.
    small = max(wv.n, nv.n) <= 0xFFFF
    rows = _capped_rows(rows, S, small)
    limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    cbs = [build_codebook(wv.counts, limit), build_codebook(nv.counts, limit)]
    payload, group_counts = encode_lockstep_tokens(
        ids, T, word_first, cbs, wv.n, nv.n, S, rows=rows)

    checksum = None
    if conf.checksum:
        import zlib
        checksum = zlib.crc32(data)
    f = container.GlzFile(
        mode=cfg.MODE_HUFFWORD,
        n_symbols=T,
        stream_symbols=S,
        stream_bits=group_counts,
        codebook_blob=huffword_cb_blob(word_first, wv, nv, cbs),
        payload=payload.astype("<u4").tobytes(),
        layout=container.LAYOUT_LOCKSTEP,
        checksum=checksum,
        group_rows=rows,
    )
    return container.write_container(f)


def compress_huffword_shared(datas: list[bytes],
                             conf: cfg.GlzConfig = cfg.DEFAULT,
                             backend: str = "host",
                             pipeline: bool = True) -> list[bytes]:
    """Compress a multi-file corpus with ONE shared dual codebook.

    The reference accumulates frequencies across files by reusing one
    encoder over Tokenizer::reset() + set_file calls (tokenizer.h:105-116,
    compressor.h:53-55); here each file's vocabularies are built
    independently, merged with tokenizer.merge_vocab_parts (the same union
    the multihost path uses), and every file's token ids are remapped into
    the union before encoding.  conf.layout / backend select the container
    exactly as the non-shared path does: lockstep (or backend="device")
    goes through the dual Pallas kernels, otherwise the host bitstream
    encoder.  Every returned container embeds the full shared codebook and
    decodes independently; core/api.compress_archive strips the repeated
    codebook bytes for the one-header total-size win."""
    from glz_tpu.ops.pallas_encode import MAX_FUSED_LEN

    per = [tok.build_vocabs(d) for d in datas]
    lockstep = backend == "device" or conf.layout == cfg.LAYOUT_LOCKSTEP
    rows = conf.group_rows
    if rows not in (8, 16, 32, 64):
        raise ValueError(f"group_rows must be 8, 16, 32 or 64, got {rows}")

    union_vocabs = []
    id_maps = []
    for cls in (3, 4):  # wv, nv of build_vocabs' return tuple
        parts = [(np.frombuffer(p[cls].blob, np.uint8),
                  np.diff(p[cls].offsets), p[cls].counts) for p in per]
        union, maps = tok.merge_vocab_parts(
            [b for b, _, _ in parts], [l for _, l, _ in parts],
            [c for _, _, c in parts])
        union_vocabs.append(union)
        id_maps.append(maps)
    uwv, unv = union_vocabs

    small = max(uwv.n, unv.n) <= 0xFFFF
    if lockstep:
        S = _huffword_stream_tokens(conf)
        rows = _capped_rows(rows, S, small)
        limit = min(conf.length_limit or MAX_FUSED_LEN, MAX_FUSED_LEN)
    else:
        limit = conf.length_limit
    cbs = [build_codebook(uwv.counts, limit), build_codebook(unv.counts, limit)]

    def one(args):
        data, (starts, lengths, word_first, wv, nv, ids), k = args
        T = ids.size
        if T:
            is_word = (np.arange(T) % 2 == 0) == word_first
            gids = np.where(
                is_word,
                id_maps[0][k][np.minimum(ids, max(wv.n - 1, 0))] if wv.n else 0,
                id_maps[1][k][np.minimum(ids, max(nv.n - 1, 0))] if nv.n else 0)
        else:
            gids = np.zeros(0, np.int64)
        if not lockstep:
            return _bitstream_container(data, conf, T, word_first, uwv, unv,
                                        gids, cbs)
        payload, group_counts = encode_lockstep_tokens(
            gids, T, word_first, cbs, uwv.n, unv.n, S, rows=rows)
        checksum = None
        if conf.checksum:
            import zlib
            checksum = zlib.crc32(data)
        return container.write_container(container.GlzFile(
            mode=cfg.MODE_HUFFWORD,
            n_symbols=T,
            stream_symbols=S,
            stream_bits=group_counts,
            codebook_blob=huffword_cb_blob(word_first, uwv, unv, cbs),
            payload=payload.astype("<u4").tobytes(),
            layout=container.LAYOUT_LOCKSTEP,
            checksum=checksum,
            group_rows=rows,
        ))

    from glz_tpu.core.api import _pipelined

    jobs = [(d, p, k) for k, (d, p) in enumerate(zip(datas, per))]
    return _pipelined(one, jobs, pipeline)


def _decompress_huffword_device(f) -> np.ndarray:
    """Decode a layout-2 huffword container with the dual-codebook Pallas
    kernel; returns the token-id array (detokenization happens upstream).
    Replaces the reference's serial alternating bit-walk
    (canonical_huffword.h:615-640)."""
    import jax
    import jax.numpy as jnp

    from glz_tpu.core.lockstep import LANES
    from glz_tpu.ops import pallas_decode as pd

    mv = memoryview(f.codebook_blob)
    word_first = bool(mv[0])
    wl, woff, wblob, off = _decode_dict_blob(mv, 1)
    nl, noff, nblob, off = _decode_dict_blob(mv, off)
    cb_w = canonical_codebook(wl)
    cb_n = canonical_codebook(nl)
    cb_even, cb_odd = (cb_w, cb_n) if word_first else (cb_n, cb_w)

    T = f.n_symbols
    S = f.stream_symbols
    rows = f.group_rows
    G = rows * LANES
    group_words = f.stream_bits.astype(np.int64)
    n_groups = group_words.size
    group_starts = np.cumsum(group_words) - group_words
    group_counts = np.clip(T - np.arange(n_groups) * G * S, 0, G * S)

    need = int(group_words.max()) + G + 2 * LANES
    mgw = max(-(-need // (1 << 16)) * (1 << 16), 1 << 12)
    payload = jnp.asarray(np.frombuffer(f.payload, dtype="<u4").astype(np.uint32))
    interpret = jax.default_backend() == "cpu"
    small = max(wl.size, nl.size) <= 0xFFFF
    ranks = pd.decode_groups_dual(
        payload,
        jnp.asarray(group_starts.astype(np.int32)),
        jnp.asarray(group_counts.astype(np.int32)),
        jnp.asarray(cb_even.first_code_left_justified()),
        jnp.asarray(cb_even.decode_offsets()),
        jnp.asarray(cb_odd.first_code_left_justified()),
        jnp.asarray(cb_odd.decode_offsets()),
        S, cb_even.min_len, cb_even.max_len,
        cb_odd.min_len, cb_odd.max_len, mgw, pack2=small,
        interpret=interpret, rows=rows)

    # rank -> token id ON DEVICE (one take from the concatenated
    # bucket-sorted symbol tables), then D2H as u16 when the vocabularies
    # fit — host↔device bandwidth dominates this path, so moving 2 bytes
    # per token instead of 4 beats any host-side mapping pass
    n_even = max(cb_even.symbols.size, 1)
    sym_cat = jnp.asarray(np.concatenate(
        [cb_even.symbols if cb_even.symbols.size else np.zeros(1, np.uint32),
         cb_odd.symbols if cb_odd.symbols.size else np.zeros(1, np.uint32)]))

    ids = np.asarray(_map_ranks_device(
        ranks, sym_cat, jnp.int32(n_even),
        S=S, small=small, rows=rows))[:T].astype(np.int64)
    return ids, word_first, (wl, woff, wblob), (nl, noff, nblob)


def _decode_tokens_host(words, stream_bits, T, stream_tokens, cbs,
                        table_bits=14, variant=cfg.DECODER_TABLE):
    """Dual-dictionary host decode with the reference's three strategies
    (canonical_huffword.h:536-841): "bitwalk" accumulates the code bit by
    bit, "fast" scans a left-justified 32-bit window against the first
    codes, "table" resolves most symbols with one LUT probe.  The
    dictionary swaps with token parity (decode_file alternation,
    canonical_huffword.h:615-640)."""
    luts = []
    for cb in cbs:
        tb = min(table_bits, 16)
        if variant == cfg.DECODER_TABLE:
            luts.append(cb.decode_luts(tb) + (tb,))
        else:
            _, fc_lj, sp, syms = cb.decode_luts(1)
            luts.append((None, fc_lj, sp, syms,
                         cb.min_len if cb.max_len else 1))
    out = np.empty(T, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(stream_bits)[:-1]]).astype(np.int64)
    padded = np.concatenate([words.astype(np.uint64), np.zeros(2, np.uint64)])

    def window32(pos):
        w = pos >> 5
        phase = pos & 31
        window = (int(padded[w]) << 32) | int(padded[w + 1])
        return (window >> (32 - phase)) & 0xFFFFFFFF

    for k, start in enumerate(starts):
        lo = k * stream_tokens
        hi = min(T, lo + stream_tokens)
        pos = int(start)
        parity = lo % 2
        for i in range(lo, hi):
            lut, fc_lj, sp, syms, tb_or_min = luts[parity]
            if variant == cfg.DECODER_TABLE:
                tb = tb_or_min
                v = window32(pos)
                entry = int(lut[v >> (32 - tb)])
                length = entry >> 16
                sym = entry & 0xFFFF
                if sym == 0xFFFF or sym >= syms.size:
                    while v < int(fc_lj[length]):
                        length += 1
                    sym = int(syms[int(sp[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
            elif variant == cfg.DECODER_FAST:
                v = window32(pos)
                length = tb_or_min
                while v < int(fc_lj[length]):
                    length += 1
                sym = int(syms[int(sp[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
            else:  # DECODER_BITWALK: one bit at a time (cc-style v<<1|bit)
                v = 0
                length = 0
                while True:
                    bit = (int(padded[(pos + length) >> 5])
                           >> (31 - ((pos + length) & 31))) & 1
                    v = (v << 1) | bit
                    length += 1
                    vlj = (v << (32 - length)) & 0xFFFFFFFF
                    if length >= tb_or_min and vlj >= int(fc_lj[length]):
                        break
                sym = int(syms[int(sp[length]) + (v - (int(fc_lj[length]) >> (32 - length)))])
            out[i] = sym
            pos += length
            parity ^= 1
    return out


def decompress_huffword(blob: bytes, backend: str = "host",
                        variant: str = cfg.DECODER_TABLE) -> bytes:
    """variant selects the host decode strategy for bitstream containers
    (bitwalk/fast/table — reference parity, canonical_huffword.h:536-841);
    lockstep containers always decode through the dual Pallas kernel."""
    f = container.read_container(blob)
    if f.mode != cfg.MODE_HUFFWORD:
        raise ValueError("not a huffword container")
    if f.layout == container.LAYOUT_LOCKSTEP:
        if f.n_symbols == 0:
            return b""
        ids, word_first, (wl, woff, wblob), (nl, noff, nblob) = \
            _decompress_huffword_device(f)

        class V:
            pass
        wv = V(); wv.n = wl.size; wv.offsets = woff; wv.blob = wblob
        nv = V(); nv.n = nl.size; nv.offsets = noff; nv.blob = nblob
        from glz_tpu.core.api import _verify
        return _verify(tok.detokenize(ids, word_first, wv, nv), f)
    mv = memoryview(f.codebook_blob)
    word_first = bool(mv[0])
    wl, woff, wblob, off = _decode_dict_blob(mv, 1)
    nl, noff, nblob, off = _decode_dict_blob(mv, off)
    cbs = [canonical_codebook(wl) if wl.size else canonical_codebook(np.zeros(1, np.int32)),
           canonical_codebook(nl) if nl.size else canonical_codebook(np.zeros(1, np.int32))]
    # stream-start parity must map through word_first: dictionary index for
    # token i is 0 if (i even) == word_first.  _decode_tokens_host uses
    # parity = lo % 2 meaning dict index (lo%2==0 -> first dict); align by
    # swapping dicts when word_first is False.
    dicts = cbs if word_first else [cbs[1], cbs[0]]

    T = f.n_symbols
    from glz_tpu.utils import native
    nat = None
    if T and variant in (cfg.DECODER_TABLE, cfg.DECODER_DEVICE):
        dts = []
        for cb in dicts:
            dts.append((cb.first_code_left_justified(), cb.decode_offsets(),
                        cb.symbols.astype(np.uint32) if cb.symbols.size else np.zeros(1, np.uint32),
                        cb.min_len if cb.max_len else 1))
        nat = native.decode_tokens(f.payload, f.stream_bits, T,
                                   f.stream_symbols, 0, dts)
    if nat is not None:
        ids = nat.astype(np.int64)
    else:
        words = bitio.bytes_to_words(f.payload)
        ids = _decode_tokens_host(words, f.stream_bits, T, f.stream_symbols,
                                  dicts, variant=variant if variant in
                                  (cfg.DECODER_BITWALK, cfg.DECODER_FAST)
                                  else cfg.DECODER_TABLE)

    class V:
        pass
    wv = V(); wv.n = wl.size; wv.offsets = woff; wv.blob = wblob
    nv = V(); nv.n = nl.size; nv.offsets = noff; nv.blob = nblob
    from glz_tpu.core.api import _verify
    return _verify(tok.detokenize(ids, word_first, wv, nv), f)
