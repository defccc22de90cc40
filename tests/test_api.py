"""The single front door: every mode and layout round-trips through the one
compress()/decompress() pair, with checksums honored everywhere (the
reference pairs each codec behind Compressor/Decompressor,
compressor.h:62-92; round-2 VERDICT item 6)."""

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
