"""glz command-line interface.

Covers the reference's utet CLI modes (unit_tests/test.cc:286-317):
  1/2 normal-tree compress/decompress, 3/4 canonical byte, 5 fast decode,
  6 table decode — plus the TPU-native paths and HuffWord.

Usage:
    python -m glz_tpu.cli compress   <in> [out] [--model canonical_byte|huffword|normal_tree]
                                      [--backend host|device] [--layout bitstream|lockstep]
                                      [--stream-symbols N] [--compat crs|crs2]
    python -m glz_tpu.cli decompress <in> [out] [--backend host|device]
                                      [--decoder table|fast|bitwalk]
    python -m glz_tpu.cli utet <in> <mode 1-6>     # reference CLI emulation
    python -m glz_tpu.cli info <in>
"""

from __future__ import annotations

import argparse
import sys
import time

from glz_tpu import config as cfg


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _write(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def cmd_compress(args) -> int:
    from glz_tpu import compress
    from glz_tpu.compat import glzip_format
    from glz_tpu.models import by_name

    data = _read(args.infile)
    t0 = time.perf_counter()
    if args.compat == "crs2":
        blob = glzip_format.write_crs2(data)
        out = args.outfile or args.infile + ".crs2"
    elif args.compat == "crs":
        blob = glzip_format.write_crs(data)
        out = args.outfile or args.infile + ".crs"
    else:
        conf = cfg.GlzConfig(stream_symbols=args.stream_symbols) if args.stream_symbols else cfg.DEFAULT
        mode = by_name(args.model)
        if args.layout == "lockstep" and mode == cfg.MODE_BYTE:
            from glz_tpu.models.canonical_byte import compress_bytes_lockstep
            blob = compress_bytes_lockstep(data, stream_symbols=args.stream_symbols or 2048, conf=conf)
        else:
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


def cmd_info(args) -> int:
    from glz_tpu.core import container

    blob = _read(args.infile)
    f = container.read_container(blob)
    layouts = {0: "bitstream", 2: "lockstep"}
    modes = {0: "canonical_byte", 1: "huffword", 2: "normal_tree"}
    print(f"mode={modes.get(f.mode, f.mode)} layout={layouts.get(f.layout, f.layout)} "
          f"symbols={f.n_symbols} streams={f.n_streams} "
          f"stream_symbols={f.stream_symbols} codebook={len(f.codebook_blob)}B "
          f"payload={len(f.payload)}B")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="glz")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress")
    c.add_argument("infile")
    c.add_argument("outfile", nargs="?")
    c.add_argument("--model", default="canonical_byte")
    c.add_argument("--backend", default="host", choices=["host", "device"])
    c.add_argument("--layout", default="bitstream", choices=["bitstream", "lockstep"])
    c.add_argument("--stream-symbols", type=int, default=0)
    c.add_argument("--compat", default=None, choices=["crs", "crs2"])
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress")
    d.add_argument("infile")
    d.add_argument("outfile", nargs="?")
    d.add_argument("--backend", default="host", choices=["host", "device"])
    d.add_argument("--decoder", default="table", choices=["table", "fast", "bitwalk"])
    d.set_defaults(fn=cmd_decompress)

    u = sub.add_parser("utet")
    u.add_argument("infile")
    u.add_argument("mode")
    u.set_defaults(fn=cmd_utet)

    i = sub.add_parser("info")
    i.add_argument("infile")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
