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


def _decode_dict_blob(mv: memoryview, off: int):
    (n,) = struct.unpack_from("<I", mv, off)
    off += 4
    lengths = np.frombuffer(mv, dtype=np.uint8, count=n, offset=off).astype(np.int32)
    off += n
    tok_lens = np.frombuffer(mv, dtype="<u4", count=n, offset=off).astype(np.int64)
    off += 4 * n
    total = int(tok_lens.sum())
    blob = bytes(mv[off : off + total])
    off += total
    offsets = np.concatenate([[0], np.cumsum(tok_lens)])
    return lengths, offsets, blob, off


def compress_huffword(data: bytes, conf: cfg.GlzConfig = cfg.DEFAULT,
                      backend: str = "host") -> bytes:
    starts, lengths, word_first, wv, nv, ids = tok.build_vocabs(data)
    T = ids.size

    cbs: list[Codebook] = []
    for v in (wv, nv):
        freqs = v.counts if v.n else np.zeros(1, np.int64)
        cbs.append(build_codebook(freqs, conf.length_limit))

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

    cb_blob = (struct.pack("<B", 1 if word_first else 0)
               + _encode_dict_blob(wv, cbs[0].lengths if wv.n else np.zeros(0))
               + _encode_dict_blob(nv, cbs[1].lengths if nv.n else np.zeros(0)))
    checksum = None
    if conf.checksum:
        import zlib
        checksum = zlib.crc32(data)
    f = container.GlzFile(
        mode=cfg.MODE_HUFFWORD,
        n_symbols=T,
        stream_symbols=stream_tokens,
        stream_bits=stream_bits.astype(np.uint64),
        codebook_blob=cb_blob,
        payload=payload_bytes_,
        checksum=checksum,
    )
    return container.write_container(f)


def _decode_tokens_host(words, stream_bits, T, stream_tokens, cbs, table_bits=14):
    """Dual-dictionary table decode: the LUT swaps with token parity
    (reference CanonicalHuffDecoder<std::string>::decode_file alternation,
    canonical_huffword.h:615-640)."""
    luts = []
    for cb in cbs:
        tb = min(table_bits, 16)
        luts.append(cb.decode_luts(tb) + (tb,))
    out = np.empty(T, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(stream_bits)[:-1]]).astype(np.int64)
    padded = np.concatenate([words.astype(np.uint64), np.zeros(2, np.uint64)])
    for k, start in enumerate(starts):
        lo = k * stream_tokens
        hi = min(T, lo + stream_tokens)
        pos = int(start)
        parity = lo % 2
        for i in range(lo, hi):
            lut, fc_lj, sp, syms, tb = luts[parity]
            w = pos >> 5
            phase = pos & 31
            window = (int(padded[w]) << 32) | int(padded[w + 1])
            v = (window >> (32 - phase)) & 0xFFFFFFFF
            entry = int(lut[v >> (32 - tb)])
            length = entry >> 16
            sym = entry & 0xFFFF
            if sym == 0xFFFF or sym >= syms.size:
                while v < int(fc_lj[length]):
                    length += 1
                sym = int(syms[int(sp[length]) + ((v - int(fc_lj[length])) >> (32 - length))])
            out[i] = sym
            pos += length
            parity ^= 1
    return out


def decompress_huffword(blob: bytes, backend: str = "host") -> bytes:
    f = container.read_container(blob)
    if f.mode != cfg.MODE_HUFFWORD:
        raise ValueError("not a huffword container")
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
    if T:
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
        ids = _decode_tokens_host(words, f.stream_bits, T, f.stream_symbols, dicts)

    class V:
        pass
    wv = V(); wv.n = wl.size; wv.offsets = woff; wv.blob = wblob
    nv = V(); nv.n = nl.size; nv.offsets = noff; nv.blob = nblob
    from glz_tpu.core.api import _verify
    return _verify(tok.detokenize(ids, word_first, wv, nv), f)
