"""glz command-line interface.

Covers the reference's utet CLI modes (unit_tests/test.cc:286-317):
  1/2 normal-tree compress/decompress, 3/4 canonical byte, 5 fast decode,
  6 table decode — plus the TPU-native paths and HuffWord.

Usage:
    python -m glz_tpu.cli compress   <in> [out] [--model canonical_byte|huffword|normal_tree]
                                      [--backend host|device] [--layout bitstream|lockstep]
                                      [--preset default|ratio|throughput]
                                      [--stream-symbols N] [--checksum] [--compat crs|crs2]
    python -m glz_tpu.cli decompress <in> [out] [--backend host|device]
                                      [--decoder table|fast|bitwalk|device]
    python -m glz_tpu.cli utet <in> <mode 1-6>     # reference CLI emulation
    python -m glz_tpu.cli info <in> [--stats] [--original FILE]
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

    blob = _read(args.infile)
    t0 = time.perf_counter()
    if blob[:4] == b"GLZ1":
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


def cmd_info(args) -> int:
    from glz_tpu.core import container

    blob = _read(args.infile)
    f = container.read_container(blob)
    layouts = {0: "bitstream", 2: "lockstep"}
    modes = {0: "canonical_byte", 1: "huffword", 2: "normal_tree"}
    print(f"mode={modes.get(f.mode, f.mode)} layout={layouts.get(f.layout, f.layout)} "
          f"symbols={f.n_symbols} streams={f.n_streams} "
          f"stream_symbols={f.stream_symbols} codebook={len(f.codebook_blob)}B "
          f"payload={len(f.payload)}B"
          + (f" checksum={f.checksum:#010x}" if f.checksum is not None else ""))
    if args.stats:
        if f.mode != cfg.MODE_BYTE:
            print("--stats: codebook statistics are byte-mode only", file=sys.stderr)
            return 2
        freqs = None
        if args.original:

            from glz_tpu.core.codebook import histogram_bytes
            freqs = histogram_bytes(_read(args.original))
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

    u = sub.add_parser("utet")
    u.add_argument("infile")
    u.add_argument("mode")
    u.set_defaults(fn=cmd_utet)

    i = sub.add_parser("info")
    i.add_argument("infile")
    i.add_argument("--stats", action="store_true")
    i.add_argument("--original", default=None,
                   help="original file for frequency/predicted-ratio columns")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
