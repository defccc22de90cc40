"""Build the native host library (g++ -O3 -shared).

Invoked automatically on first import of glz_tpu.utils.native; can also be
run directly: python native/build.py
"""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "glz_native.cpp"
OUT = HERE / "libglz_native.so"


def build(force: bool = False) -> pathlib.Path | None:
    if OUT.exists() and not force and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(SRC), "-o", str(OUT)]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0:
        # retry without -march=native (portability)
        cmd.remove("-march=native")
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            sys.stderr.write(r.stderr.decode()[:500] + "\n")
            return None
    return OUT


if __name__ == "__main__":
    p = build(force=True)
    print(p if p else "BUILD FAILED")
    sys.exit(0 if p else 1)
