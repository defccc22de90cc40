"""Normal (explicit-tree) Huffman codec — the reference's legacy model.

The reference marks this path experimental/legacy
(normal_huff_encoder.h:17-19) but ships it; capability parity keeps it as a
host-side model producing/consuming the reference's own .crs payload (see
glz_tpu/compat/glzip_format.py for the byte-level layout).  There is no TPU
path: tree-walk decode is strictly serial and the canonical models subsume
it; this exists for interop and completeness.

Through the front door (api.compress/decompress) the .crs bytes ride inside
a mode-2 .glz container so decompress() can route on the self-describing
header, mirroring the reference's paired Compressor/Decompressor interface
(compressor.h:62-92).  The raw format is still available via
glzip_format.write_crs / read_crs and the CLI --compat flag.
"""

from __future__ import annotations

import numpy as np

from glz_tpu import config as cfg
from glz_tpu.compat import glzip_format
from glz_tpu.core import container


def compress_normal_tree(data: bytes, conf: cfg.GlzConfig = cfg.DEFAULT) -> bytes:
    crs = glzip_format.write_crs(data)
    checksum = None
    if conf.checksum:
        import zlib
        checksum = zlib.crc32(data)
    f = container.GlzFile(
        mode=cfg.MODE_NORMAL_TREE,
        n_symbols=len(data),
        stream_symbols=0,
        stream_bits=np.zeros(0, np.uint64),
        codebook_blob=b"",  # the .crs payload carries its own serialized tree
        payload=crs,
        checksum=checksum,
    )
    return container.write_container(f)


def decompress_normal_tree(blob: bytes) -> bytes:
    f = container.read_container(blob)
    if f.mode != cfg.MODE_NORMAL_TREE:
        raise ValueError("not a normal-tree container")
    from glz_tpu.core.api import _verify
    return _verify(glzip_format.read_crs(f.payload), f)
