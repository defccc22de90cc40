"""Runtime configuration for glz-tpu.

The reference configures itself with CMake options -> preprocessor symbols
(DEBUG/DEBUG2), compile-time template parameters (encoder class, TableLength)
and positional argv (reference: CMakeLists.txt:38-79, unit_tests/test.cc:286-317).
Here that becomes one runtime dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


# Symbol modes (reference: TypeTraits char_tag/string_tag, type_traits.h:36-38)
MODE_BYTE = 0        # 256 byte symbols (reference adds an EOF symbol 256; the
                     # block container does not need one: counts are explicit)
MODE_HUFFWORD = 1    # dual word/non-word token dictionaries
MODE_NORMAL_TREE = 2 # legacy explicit-tree codec (host-only compat path)

# Decoder strategies, mirroring the reference's three decoder variants
# (canonical_huff_encoder.cc:377-419 bit-walk, cc:422-461 fast 32-bit buffer,
#  cc:519-568 8-bit LUT).  "device" routes decompress() to the TPU
# block-parallel decoder regardless of the backend argument.
DECODER_BITWALK = "bitwalk"
DECODER_FAST = "fast"
DECODER_TABLE = "table"
DECODER_DEVICE = "device"

# Payload layouts (mirrored by glz_tpu.core.container constants)
LAYOUT_BITSTREAM = "bitstream"  # bit-stitched streams + per-stream bit table
LAYOUT_LOCKSTEP = "lockstep"    # decoder-consumption-order words (Pallas path)


@dataclasses.dataclass(frozen=True)
class GlzConfig:
    """Knobs for the block-parallel codec.

    stream_symbols: number of input symbols per independent bit stream.
        Streams are the unit of parallel decode; per-stream overhead is a
        4-byte bit-length table entry.  Smaller streams = more parallelism,
        more overhead.  The lockstep layout requires a power of two in
        [64, 8192] (the Pallas kernels' VMEM window budget).
    max_streams: upper bound on stream count for the bitstream layout (keeps
        the stream table within the size budget vs. the reference's header:
        a 100 MB file at <=256 streams costs ~1 KB, below the reference's
        ~1.2 KB header).
    table_bits: decoder LUT width.  The reference uses TableLength=8
        (canonical_huff_encoder.h:186); 16 resolves almost every real code
        in one probe.  Codes longer than table_bits take the slow path,
        exactly as the reference does (cc:558-562).
    length_limit: optional hard cap on code length (package-merge).  None
        means "whatever Huffman produces" (reference assumes <=32,
        canonical_huff_encoder.h:43); we enforce <=32 for container sanity.
        The lockstep layout additionally caps at 26 (the Pallas kernels'
        fused lj|len entry word spends 6 bits on the length).
    layout: payload layout for byte-mode compress() — LAYOUT_BITSTREAM
        (default, host/XLA paths) or LAYOUT_LOCKSTEP (the Pallas TPU
        throughput path).
    checksum: store a crc32 of the original data in the container and verify
        it on decompress (all modes/layouts).
    histogram_budget: byte budget for the codebook histogram.  None = exact
        scan of the whole input (reference behavior); a value (e.g. 16 MiB,
        the THROUGHPUT preset) estimates frequencies from evenly spaced
        4 KiB blocks with +1 smoothing — round trips stay bit-exact (any
        histogram yields a valid code), ratio changes <~0.1% on stationary
        inputs, and the O(n) histogram pass leaves the encode critical path.
    group_rows: lockstep group geometry — a group lockstep-decodes
        group_rows*128 streams per kernel step.  Wider groups amortize the
        Pallas kernels' ~220-cycle/step control floor over more lanes
        (measured r4 on v5e: decode 1.16 -> 2.01 GB/s from 8 to 64 rows);
        8/16/32/64 are supported and the container records the value
        (header byte 7).  The HuffWord device path caps the value by its
        own VMEM budget (models/huffword.py).
    """

    stream_symbols: int = 1 << 18        # 256 KiB of input per stream
    max_streams: int = 1 << 16
    table_bits: int = 16
    length_limit: Optional[int] = 32
    layout: str = LAYOUT_BITSTREAM
    checksum: bool = False
    histogram_budget: Optional[int] = None
    group_rows: int = 8


# Preset matching the strict "compressed size <= reference" comparison
# (BASELINE.md config 1/2): few streams, tiny header.
RATIO = GlzConfig(stream_symbols=1 << 19, max_streams=192)

# Preset for maximum device throughput (BASELINE throughput runs): lockstep
# layout, Pallas kernels, 512-symbol streams in 64-row (8192-stream) groups
# (the r4 sweep optimum: decode 2.0 GB/s, encode 1.19 GB/s on v5e),
# sampled histogram.
THROUGHPUT = GlzConfig(stream_symbols=1 << 9, layout=LAYOUT_LOCKSTEP,
                       histogram_budget=8 << 20, group_rows=64)

DEFAULT = GlzConfig()
