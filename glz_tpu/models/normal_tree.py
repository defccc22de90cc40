"""Normal (explicit-tree) Huffman codec — the reference's legacy model.

The reference marks this path experimental/legacy
(normal_huff_encoder.h:17-19) but ships it; capability parity keeps it as a
host-side model producing/consuming the reference's own .crs format (see
glz_tpu/compat/glzip_format.py for the byte-level layout).  There is no TPU
path: tree-walk decode is strictly serial and the canonical models subsume
it; this exists for interop and completeness.
"""

from __future__ import annotations

from glz_tpu.compat import glzip_format


def compress_normal_tree(data: bytes) -> bytes:
    return glzip_format.write_crs(data)


def decompress_normal_tree(blob: bytes) -> bytes:
    return glzip_format.read_crs(blob)
