"""glz command-line interface.

Covers the reference's utet CLI modes (unit_tests/test.cc:286-317):
  1/2 normal-tree compress/decompress, 3/4 canonical byte, 5 fast decode,
  6 table decode — plus the TPU-native paths and HuffWord.

Usage:
    python -m glz_tpu.cli compress   <in> [out] [--model canonical_byte|huffword|normal_tree]
                                      [--backend host|device] [--layout bitstream|lockstep]
                                      [--preset default|ratio|throughput]
                                      [--stream-symbols N] [--group-rows 8|16|32|64]
                                      [--checksum] [--compat crs|crs2|crs3]
    python -m glz_tpu.cli decompress <in> [out] [--backend host|device]
                                      [--decoder table|fast|bitwalk|device]
    python -m glz_tpu.cli archive   <out.glzb> <in>... [compress options]
    python -m glz_tpu.cli unarchive <in.glzb> <out>... [--backend ...]
    python -m glz_tpu.cli utet <in> <mode 1-6>     # reference CLI emulation
    python -m glz_tpu.cli info <in> [--stats] [--original FILE] [--dot FILE]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

# GLZ_PLATFORM=cpu forces the CPU backend (Pallas kernels run in interpret
# mode) even when a TPU plugin is installed that ignores JAX_PLATFORMS —
# the escape hatch for TPU-less use and for CI (tests/conftest.py does the
# same).  Must happen before any jax import.
if os.environ.get("GLZ_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["GLZ_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["GLZ_PLATFORM"])

from glz_tpu import config as cfg

PRESETS = {"default": cfg.DEFAULT, "ratio": cfg.RATIO, "throughput": cfg.THROUGHPUT}


def _prepare_device_backend() -> None:
    """Device-path ergonomics: enable the persistent compilation cache (as
    bench.py does) and warn about first-time Mosaic compiles, which take
    minutes over a TPU tunnel and are NOT captured by the cache."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("GLZ_JAX_CACHE", "/tmp/glz_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"note: persistent compilation cache unavailable: {e!r}",
              file=sys.stderr)
    if jax.default_backend() != "cpu":
        print("note: first-time Pallas kernel compiles on this backend can "
              "take several minutes (Mosaic kernels are not captured by the "
              "persistent cache); later kernels in this process are fast",
              file=sys.stderr, flush=True)


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _write(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def _make_conf(args) -> cfg.GlzConfig:
    conf = PRESETS[args.preset]
    over = {}
    if args.layout:
        over["layout"] = args.layout
        if args.layout == cfg.LAYOUT_LOCKSTEP and conf.layout != cfg.LAYOUT_LOCKSTEP \
                and not args.stream_symbols:
            over["stream_symbols"] = cfg.THROUGHPUT.stream_symbols
    if args.stream_symbols:
        over["stream_symbols"] = args.stream_symbols
    if getattr(args, "group_rows", 0):
        over["group_rows"] = args.group_rows
    if args.checksum:
        over["checksum"] = True
    return dataclasses.replace(conf, **over) if over else conf


def cmd_compress(args) -> int:
    from glz_tpu import compress
    from glz_tpu.compat import glzip_format
    from glz_tpu.models import by_name

    data = _read(args.infile)
    t0 = time.perf_counter()
    if args.compat == "crs2":
        blob = glzip_format.write_crs2(data)
        out = args.outfile or args.infile + ".crs2"
    elif args.compat == "crs3":
        blob = glzip_format.write_crs3(data)
        out = args.outfile or args.infile + ".crs3"
    elif args.compat == "crs":
        blob = glzip_format.write_crs(data)
        out = args.outfile or args.infile + ".crs"
    else:
        conf = _make_conf(args)
        mode = by_name(args.model)
        if args.backend == "device" or conf.layout == cfg.LAYOUT_LOCKSTEP:
            _prepare_device_backend()
        blob = compress(data, mode=mode, backend=args.backend, conf=conf)
        out = args.outfile or args.infile + ".glz"
    dt = time.perf_counter() - t0
    _write(out, blob)
    ratio = len(blob) / max(1, len(data))
    print(f"{args.infile} -> {out}: {len(data)} -> {len(blob)} bytes "
          f"(ratio {ratio:.4f}) in {dt*1e3:.1f} ms "
          f"[{len(data)/max(dt,1e-9)/1e6:.1f} MB/s]")
    return 0


def cmd_decompress(args) -> int:
    from glz_tpu import decompress
    from glz_tpu.compat import glzip_format

    from glz_tpu.core import container

    blob = _read(args.infile)
    t0 = time.perf_counter()
    if container.is_glz(blob):
        # lockstep containers always decode through the Pallas kernels
        if (args.backend == "device" or args.decoder == "device"
                or container.peek_layout(blob) == container.LAYOUT_LOCKSTEP):
            _prepare_device_backend()
        data = decompress(blob, backend=args.backend, variant=args.decoder)
    elif args.infile.endswith(".crs3"):
        data = glzip_format.read_crs3(blob)
    elif args.infile.endswith(".crs2"):
        data = glzip_format.read_crs2(blob)
    elif args.infile.endswith(".crs"):
        data = glzip_format.read_crs(blob)
    else:
        data = decompress(blob, backend=args.backend, variant=args.decoder)
    dt = time.perf_counter() - t0
    out = args.outfile or args.infile + ".de"   # reference default (encoder.h:229-231)
    _write(out, data)
    print(f"{args.infile} -> {out}: {len(blob)} -> {len(data)} bytes "
          f"in {dt*1e3:.1f} ms [{len(data)/max(dt,1e-9)/1e6:.1f} MB/s]")
    return 0


def cmd_utet(args) -> int:
    """Reference utet CLI emulation (test.cc:291-317)."""
    from glz_tpu.compat import glzip_format

    mode = int(args.mode)
    data = _read(args.infile)
    if mode == 1:
        _write(args.infile + ".crs", glzip_format.write_crs(data))
    elif mode == 2:
        _write(args.infile + ".de", glzip_format.read_crs(data))
    elif mode == 3:
        _write(args.infile + ".crs2", glzip_format.write_crs2(data))
    elif mode in (4, 5, 6):  # three decoder strategies, same result
        _write(args.infile + ".de", glzip_format.read_crs2(data))
    else:
        print("mode must be 1-6", file=sys.stderr)
        return 2
    return 0


def stats_report(f, freqs=None) -> str:
    """Codebook statistics for a byte-mode container — the reference's
    per-symbol freq/length/code report with average code length and
    predicted compression ratio (canonical_huff_encoder.cc:144-186,
    normal_huff_encoder.h:204-271).  freqs (a 256-bin histogram of the
    original data) enables the frequency and predicted-ratio columns."""
    import numpy as np

    from glz_tpu.core import container
    from glz_tpu.core.codebook import canonical_codebook

    lengths = container.decode_byte_codebook(f.codebook_blob)
    cb = canonical_codebook(lengths)
    lines = ["symbol  char  freq        length  code"]
    for s in range(256):
        if lengths[s] == 0 and (freqs is None or freqs[s] == 0):
            continue
        ch = chr(s) if 32 <= s < 127 else "."
        fr = f"{int(freqs[s]):<10d}" if freqs is not None else "-         "
        code = format(int(cb.codewords[s]), f"0{int(lengths[s])}b") if lengths[s] else "-"
        lines.append(f"{s:<7d} {ch}     {fr}  {int(lengths[s]):<7d} {code}")
    if f.layout == container.LAYOUT_LOCKSTEP:
        payload_bits = 32 * int(f.stream_bits.sum())
    else:
        payload_bits = int(f.stream_bits.sum())
    if f.n_symbols:
        actual = payload_bits / (8 * f.n_symbols)
        lines.append(f"actual payload ratio: {actual:.4f} "
                     f"({payload_bits} bits / {f.n_symbols} symbols)")
    if freqs is not None and freqs.sum() > 0:
        avg = float((freqs * lengths).sum() / freqs.sum())
        lines.append(f"average code length: {avg:.4f} bits/symbol")
        lines.append(f"predicted ratio: {avg / 8:.4f}")
    return "\n".join(lines)


def _payload_bits(f) -> int:
    from glz_tpu.core import container

    if f.layout == container.LAYOUT_LOCKSTEP:
        return 32 * int(f.stream_bits.sum())
    return int(f.stream_bits.sum())


def stats_report_huffword(f, original: bytes | None = None, top: int = 20) -> str:
    """Per-dictionary token/freq/length/code tables for a huffword
    container — parity with the reference's dual-dict stats report
    (canonical_huffword.h:254-294).  With the original file, adds the
    frequency column and the predicted (avg-code-length) compression ratio
    next to the actual payload ratio."""
    import numpy as np

    from glz_tpu.core.codebook import canonical_codebook
    from glz_tpu.models.huffword import _decode_dict_blob
    from glz_tpu.utils import tokenizer as tok

    mv = memoryview(f.codebook_blob)
    word_first = bool(mv[0])
    wl, woff, wblob, off = _decode_dict_blob(mv, 1)
    nl, noff, nblob, off = _decode_dict_blob(mv, off)

    counts = [None, None]
    lines = [f"word_first={word_first}"]
    if original is not None:
        # build_vocabs assigns (length, content)-rank ids — the same order
        # the container stores, so counts align with the stored tables
        _, _, wf, wv, nv, _ = tok.build_vocabs(original)
        if wv.n == wl.size and nv.n == nl.size:
            counts = [wv.counts, nv.counts]
        else:
            lines.append(
                f"warning: --original tokenizes to {wv.n}+{nv.n} vocab "
                f"entries but this container stores {wl.size}+{nl.size} — "
                "wrong file?  frequency/predicted-ratio columns omitted")
    pred_bits = 0
    for name, lengths, offs, blob, freq in (
            ("word", wl, woff, wblob, counts[0]),
            ("nonword", nl, noff, nblob, counts[1])):
        n = lengths.size
        lo = int(lengths.min()) if n else 0
        lines.append(f"-- {name} dictionary: {n} tokens, "
                     f"code lengths [{lo},{int(lengths.max(initial=0))}]")
        if n == 0:
            continue
        cb = canonical_codebook(lengths)
        if freq is not None:
            tot = int(freq.sum())
            avg = float((freq * lengths).sum()) / max(tot, 1)
            pred_bits += int((freq * lengths).sum())
            lines.append(f"   {tot} occurrences, avg code length {avg:.4f} bits")
            order = np.argsort(-freq, kind="stable")[:top]
        else:
            order = np.argsort(lengths, kind="stable")[:top]
        lines.append("token                    freq        length  code")
        for i in order:
            t = bytes(blob[int(offs[i]) : int(offs[i + 1])])
            disp = repr(t)[1:]
            if len(disp) > 22:
                disp = disp[:19] + "..."
            fr = f"{int(freq[i]):<10d}" if freq is not None else "-         "
            code = format(int(cb.codewords[i]), f"0{int(lengths[i])}b")
            lines.append(f"{disp:<24} {fr}  {int(lengths[i]):<7d} {code}")
    bits = _payload_bits(f)
    if f.n_symbols:
        lines.append(f"actual payload: {bits} bits / {f.n_symbols} tokens "
                     f"({bits / f.n_symbols:.2f} bits/token)")
    if original is not None and len(original):
        lines.append(f"actual ratio: {bits / (8 * len(original)):.4f}")
        if pred_bits:
            lines.append(f"predicted ratio: {pred_bits / (8 * len(original)):.4f}")
    return "\n".join(lines)


def stats_report_tree(f, freqs=None) -> str:
    """Normal-tree codec stats: per-symbol freq/length/code from the .crs
    payload's serialized tree (reference do_print_encode,
    normal_huff_encoder.h:204-271)."""
    from glz_tpu.compat import glzip_format

    table = glzip_format.crs_code_table(f.payload)
    lines = ["symbol  char  freq        length  code"]
    for s in sorted(table):
        ch = chr(s) if 32 <= s < 127 else "."
        fr = f"{int(freqs[s]):<10d}" if freqs is not None else "-         "
        lines.append(f"{s:<7d} {ch}     {fr}  {len(table[s]):<7d} {table[s]}")
    if freqs is not None and freqs.sum() > 0:
        avg = float(sum(int(freqs[s]) * len(c) for s, c in table.items())) / float(freqs.sum())
        lines.append(f"average code length: {avg:.4f} bits/symbol")
        lines.append(f"predicted ratio: {avg / 8:.4f}")
    return "\n".join(lines)


def cmd_archive(args) -> int:
    """Shared-codebook multi-file archive (.glzb): one codebook header for
    the corpus (core/api.compress_archive) — the reference's one-encoder-
    many-files accumulation (compressor.h:53-55) as a CLI surface."""
    from glz_tpu import compress_archive
    from glz_tpu.models import by_name

    datas = [_read(f) for f in args.infiles]
    conf = _make_conf(args)
    if args.backend == "device" or conf.layout == cfg.LAYOUT_LOCKSTEP:
        _prepare_device_backend()
    t0 = time.perf_counter()
    blob = compress_archive(datas, mode=by_name(args.model),
                            backend=args.backend, conf=conf)
    dt = time.perf_counter() - t0
    _write(args.outfile, blob)
    total = sum(len(d) for d in datas)
    print(f"{len(datas)} files -> {args.outfile}: {total} -> {len(blob)} "
          f"bytes (ratio {len(blob)/max(1, total):.4f}) in {dt*1e3:.1f} ms")
    return 0


def cmd_unarchive(args) -> int:
    from glz_tpu import decompress_archive
    from glz_tpu.core import container
    from glz_tpu.core.api import archive_peek_layout

    blob = _read(args.infile)
    if (args.backend == "device"
            or archive_peek_layout(blob) == container.LAYOUT_LOCKSTEP):
        _prepare_device_backend()
    t0 = time.perf_counter()
    datas = decompress_archive(blob, backend=args.backend)
    dt = time.perf_counter() - t0
    if len(args.outfiles) != len(datas):
        print(f"archive holds {len(datas)} files but {len(args.outfiles)} "
              f"output names given", file=sys.stderr)
        return 2
    for out, d in zip(args.outfiles, datas):
        _write(out, d)
    total = sum(len(d) for d in datas)
    print(f"{args.infile} -> {len(datas)} files, {total} bytes "
          f"in {dt*1e3:.1f} ms")
    return 0


def cmd_info(args) -> int:
    import struct

    from glz_tpu.core import container
    from glz_tpu.core.api import ARCHIVE_MAGIC

    blob = _read(args.infile)
    layouts = {0: "bitstream", 2: "lockstep"}
    modes = {0: "canonical_byte", 1: "huffword", 2: "normal_tree"}
    if blob[:4] == ARCHIVE_MAGIC:
        _m, ver, mode, _r, n_files, cb_size = struct.unpack_from(
            "<4sBBHII", blob, 0)
        off = 16 + cb_size
        entries = []
        for _k in range(n_files):
            plen, blen = struct.unpack_from("<IQ", blob, off)
            off += 12 + plen
            (_, _, _, flags, _, n_symbols, n_streams, _, _, _) = \
                struct.unpack_from(container.HEADER_FMT, blob, off)
            entries.append((n_symbols, blen + plen, flags & 0x0F))
            off += blen
        print(f"archive mode={modes.get(mode, mode)} files={n_files} "
              f"shared_codebook={cb_size}B "
              f"layout={layouts.get(entries[0][2], entries[0][2]) if entries else '-'}")
        for k, (n_symbols, size, _l) in enumerate(entries):
            print(f"  file {k}: symbols={n_symbols} entry={size}B")
        return 0
    f = container.read_container(blob)
    print(f"mode={modes.get(f.mode, f.mode)} layout={layouts.get(f.layout, f.layout)} "
          f"symbols={f.n_symbols} streams={f.n_streams} "
          f"stream_symbols={f.stream_symbols} codebook={len(f.codebook_blob)}B "
          f"payload={len(f.payload)}B"
          + (f" checksum={f.checksum:#010x}" if f.checksum is not None else ""))
    if args.dot:
        # Graphviz tree rendering — the reference's DEBUG2 visualizer
        # (huff_tree.cc:12-136) as dependency-free DOT text
        if f.mode != cfg.MODE_NORMAL_TREE:
            print("--dot: tree rendering applies to normal_tree containers "
                  "only (canonical codecs have no explicit tree)",
                  file=sys.stderr)
            return 2
        from glz_tpu.compat import glzip_format
        with open(args.dot, "w") as fh:
            fh.write(glzip_format.crs_tree_dot(f.payload) + "\n")
        print(f"Huffman tree written to {args.dot} (render: dot -Tpng)")
    if args.stats:
        original = _read(args.original) if args.original else None
        if f.mode == cfg.MODE_HUFFWORD:
            print(stats_report_huffword(f, original))
            return 0
        freqs = None
        if original is not None:
            from glz_tpu.core.codebook import histogram_bytes
            freqs = histogram_bytes(original)
        if f.mode == cfg.MODE_NORMAL_TREE:
            print(stats_report_tree(f, freqs))
            return 0
        print(stats_report(f, freqs))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="glz")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress")
    c.add_argument("infile")
    c.add_argument("outfile", nargs="?")
    c.add_argument("--model", default="canonical_byte")
    c.add_argument("--backend", default="host", choices=["host", "device"])
    c.add_argument("--layout", default=None, choices=["bitstream", "lockstep"])
    c.add_argument("--preset", default="default", choices=sorted(PRESETS))
    c.add_argument("--stream-symbols", type=int, default=0)
    c.add_argument("--group-rows", type=int, default=0,
                   help="lockstep group geometry (8/16/32/64 rows of 128 "
                        "streams; default from preset)")
    c.add_argument("--checksum", action="store_true")
    c.add_argument("--compat", default=None, choices=["crs", "crs2", "crs3"])
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress")
    d.add_argument("infile")
    d.add_argument("outfile", nargs="?")
    d.add_argument("--backend", default="host", choices=["host", "device"])
    d.add_argument("--decoder", default="table",
                   choices=["table", "fast", "bitwalk", "device"])
    d.set_defaults(fn=cmd_decompress)

    a = sub.add_parser("archive")
    a.add_argument("outfile")
    a.add_argument("infiles", nargs="+")
    a.add_argument("--model", default="canonical_byte")
    a.add_argument("--backend", default="host", choices=["host", "device"])
    a.add_argument("--layout", default=None, choices=["bitstream", "lockstep"])
    a.add_argument("--preset", default="default", choices=sorted(PRESETS))
    a.add_argument("--stream-symbols", type=int, default=0)
    a.add_argument("--group-rows", type=int, default=0)
    a.add_argument("--checksum", action="store_true")
    a.set_defaults(fn=cmd_archive)

    ua = sub.add_parser("unarchive")
    ua.add_argument("infile")
    ua.add_argument("outfiles", nargs="+")
    ua.add_argument("--backend", default="host", choices=["host", "device"])
    ua.set_defaults(fn=cmd_unarchive)

    u = sub.add_parser("utet")
    u.add_argument("infile")
    u.add_argument("mode")
    u.set_defaults(fn=cmd_utet)

    i = sub.add_parser("info")
    i.add_argument("infile")
    i.add_argument("--stats", action="store_true")
    i.add_argument("--original", default=None,
                   help="original file for frequency/predicted-ratio columns")
    i.add_argument("--dot", default=None,
                   help="write the normal-tree codec's Huffman tree as "
                        "Graphviz DOT to this path")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
