"""The single front door: every mode and layout round-trips through the one
compress()/decompress() pair, with checksums honored everywhere (the
reference pairs each codec behind Compressor/Decompressor,
compressor.h:62-92; round-2 VERDICT item 6)."""

import numpy as np
import pytest

from glz_tpu import compress, decompress
from glz_tpu import config as cfg


@pytest.mark.parametrize("mode", [cfg.MODE_BYTE, cfg.MODE_HUFFWORD,
                                  cfg.MODE_NORMAL_TREE])
def test_all_modes_roundtrip_with_checksum(text_100kb, mode):
    data = text_100kb[:40_000]
    conf = cfg.GlzConfig(checksum=True)
    blob = compress(data, mode=mode, conf=conf)
    assert decompress(blob) == data


def test_normal_tree_checksum_detects_corruption(text_100kb):
    data = text_100kb[:10_000]
    blob = bytearray(compress(data, mode=cfg.MODE_NORMAL_TREE,
                              conf=cfg.GlzConfig(checksum=True)))
    blob[-20] ^= 0x40
    with pytest.raises(ValueError):
        decompress(bytes(blob))


def test_device_backend_checksum(text_100kb):
    conf = cfg.GlzConfig(stream_symbols=4096, checksum=True)
    blob = compress(text_100kb, backend="device", conf=conf)
    assert decompress(blob, backend="device") == text_100kb


def test_decoder_device_variant(text_100kb):
    """DECODER_DEVICE is a real decoder strategy selector."""
    blob = compress(text_100kb, conf=cfg.GlzConfig(stream_symbols=4096))
    assert decompress(blob, variant=cfg.DECODER_DEVICE) == text_100kb


def test_throughput_preset_is_lockstep(text_100kb):
    from glz_tpu.core import container
    blob = compress(text_100kb, conf=cfg.THROUGHPUT)
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == text_100kb


def test_ratio_preset_roundtrip(text_100kb):
    blob = compress(text_100kb, conf=cfg.RATIO)
    assert decompress(blob) == text_100kb


def test_compress_batch_mixed_files(rng, text_100kb):
    """Silesia-style multi-file batch (BASELINE config 4 shape): files with
    very different statistics, each with its own codebook and container."""
    from glz_tpu import compress_batch, decompress_batch

    p = rng.dirichlet(np.ones(256) * 0.02)
    files = [
        text_100kb,                                            # text
        rng.choice(256, size=80_000, p=p).astype(np.uint8).tobytes(),  # skewed
        rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes(),   # random
        b"\x00" * 50_000,                                      # degenerate
        b"",                                                   # empty
    ]
    blobs = compress_batch(files)
    assert decompress_batch(blobs) == files
    blobs_ls = compress_batch(files, conf=cfg.GlzConfig(
        stream_symbols=256, layout=cfg.LAYOUT_LOCKSTEP))
    assert decompress_batch(blobs_ls) == files


def test_compress_batch_pipelined_matches_serial(rng, text_100kb):
    """The 2-deep batch pipeline must produce byte-identical containers to
    the serial loop, in input order."""
    from glz_tpu import compress_batch

    files = [text_100kb[:40_000], text_100kb[20_000:70_000],
             rng.integers(0, 256, size=30_000, dtype=np.uint8).tobytes(),
             text_100kb[::-1]]
    assert compress_batch(files) == compress_batch(files, pipeline=False)


# ---- r5: real-text round trips across every mode/layout ------------------

def test_realtext_all_modes_roundtrip(realtext):
    """Bit-exact round trip on REAL text (markup + UTF-8 multibyte + long
    runs) through byte-bitstream, byte-lockstep, huffword-bitstream,
    huffword-lockstep and normal-tree; ratios must also beat raw."""
    from glz_tpu import compress, decompress
    from glz_tpu.config import (MODE_BYTE, MODE_HUFFWORD, MODE_NORMAL_TREE,
                                GlzConfig, LAYOUT_LOCKSTEP)

    data = realtext
    cases = [
        (MODE_BYTE, GlzConfig(checksum=True)),
        (MODE_BYTE, GlzConfig(stream_symbols=512, layout=LAYOUT_LOCKSTEP,
                              group_rows=16, checksum=True)),
        (MODE_HUFFWORD, GlzConfig()),
        (MODE_HUFFWORD, GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)),
        (MODE_NORMAL_TREE, GlzConfig()),
    ]
    for mode, conf in cases:
        blob = compress(data, mode=mode, conf=conf)
        assert decompress(blob) == data, (mode, conf.layout)
        assert len(blob) < len(data), (mode, conf.layout, len(blob))
