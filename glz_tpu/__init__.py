"""glz-tpu: a TPU-native canonical-Huffman compression framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the C++
reference codec chenghuige/golden-huffman (see SURVEY.md): byte-symbol and
word-symbol ("HuffWord") canonical Huffman coding with bit-exact round trips,
three decoder strategies, self-describing containers, plus a block-parallel
TPU execution model the reference (a strictly serial file streamer) lacks.

Public API:
    compress(data, mode=...)   -> bytes (.glz container)
    decompress(blob)           -> bytes
    CanonicalByteCodec / HuffWordCodec / NormalTreeCodec (models registry)
"""

__version__ = "0.1.0"

from glz_tpu.core.api import (compress, decompress,  # noqa: F401
                              compress_batch, decompress_batch,
                              compress_archive, decompress_archive)
from glz_tpu import config  # noqa: F401
from glz_tpu.config import GlzConfig  # noqa: F401
