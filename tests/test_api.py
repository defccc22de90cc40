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


# ---- r5: shared-codebook batch + .glzb archive ---------------------------

def test_batch_shared_codebook_byte(rng):
    """compress_batch(shared_codebook=True): one accumulated histogram,
    identical codebook blob in every container, independent decode."""
    from glz_tpu import compress_batch, decompress
    from glz_tpu.core import container

    p = rng.dirichlet(np.ones(256) * 0.1)
    files = [rng.choice(256, size=n, p=p).astype(np.uint8).tobytes()
             for n in (30_000, 50_000, 10_000)]
    blobs = compress_batch(files, shared_codebook=True)
    cbs = {container.read_container(b).codebook_blob for b in blobs}
    assert len(cbs) == 1
    for b, d in zip(blobs, files):
        assert decompress(b) == d


def test_batch_shared_codebook_huffword(text_100kb):
    from glz_tpu import compress_batch, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP

    files = [text_100kb[:40_000], text_100kb[40_000:75_000],
             b"completely different words here " * 300]
    conf = GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)
    blobs = compress_batch(files, mode=MODE_HUFFWORD, conf=conf,
                           shared_codebook=True)
    from glz_tpu.core import container
    # shared dicts: blobs differ at most in the word_first byte
    tails = {container.read_container(b).codebook_blob[1:] for b in blobs}
    assert len(tails) == 1
    for b, d in zip(blobs, files):
        assert decompress(b) == d


def test_archive_roundtrip_and_size_byte(rng):
    from glz_tpu import compress_archive, decompress_archive, compress_batch

    p = rng.dirichlet(np.ones(256) * 0.1)
    files = [rng.choice(256, size=20_000, p=p).astype(np.uint8).tobytes()
             for _ in range(4)]
    arc = compress_archive(files)
    assert decompress_archive(arc) == files
    per_file = compress_batch(files)
    # one emitted codebook: smaller than per-file containers in total
    assert len(arc) < sum(len(b) for b in per_file)


def test_archive_roundtrip_and_size_huffword(realtext):
    """The Silesia-shape claim (r4 review next #7): a shared-codebook
    archive beats per-file headers on total size — decisive for huffword,
    whose codebook embeds the vocabulary text."""
    from glz_tpu import compress_archive, decompress_archive, compress_batch
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP

    n4 = 60_000
    files = [realtext[i * n4 : (i + 1) * n4] for i in range(4)]
    conf = GlzConfig(stream_symbols=64, layout=LAYOUT_LOCKSTEP)
    arc = compress_archive(files, mode=MODE_HUFFWORD, conf=conf)
    assert decompress_archive(arc) == files
    per_file = compress_batch(files, mode=MODE_HUFFWORD, conf=conf)
    assert len(arc) < sum(len(b) for b in per_file)


def test_archive_corrupt_rejected():
    import pytest

    from glz_tpu import compress_archive, decompress_archive

    arc = compress_archive([b"abc" * 100, b"def" * 100])
    with pytest.raises(ValueError):
        decompress_archive(arc[:20])
    with pytest.raises(ValueError):
        decompress_archive(b"NOPE" + arc[4:])
    with pytest.raises(ValueError):
        decompress_archive(arc[:-10])


def test_archive_checksum(rng):
    import pytest

    from glz_tpu import compress_archive, decompress_archive
    from glz_tpu.config import GlzConfig

    files = [rng.integers(0, 64, 9000, dtype=np.uint8).tobytes()
             for _ in range(2)]
    arc = compress_archive(files, conf=GlzConfig(checksum=True))
    assert decompress_archive(arc) == files
    bad = bytearray(arc)
    bad[len(bad) - 100] ^= 0x04  # flip a bit inside the last payload
    with pytest.raises(ValueError, match="checksum mismatch"):
        decompress_archive(bytes(bad))


def test_batch_shared_huffword_bitstream_layout(text_100kb):
    """shared_codebook huffword honors conf.layout: the default bitstream
    conf must produce layout-0 containers with the union codebook (r5
    review: it silently forced lockstep)."""
    from glz_tpu import compress_batch, decompress
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig
    from glz_tpu.core import container

    files = [text_100kb[:20_000], text_100kb[20_000:35_000]]
    blobs = compress_batch(files, mode=MODE_HUFFWORD, conf=GlzConfig(),
                           shared_codebook=True)
    tails = set()
    for b, d in zip(blobs, files):
        f = container.read_container(b)
        assert f.layout == container.LAYOUT_BITSTREAM
        tails.add(f.codebook_blob[1:])
        assert decompress(b) == d
    assert len(tails) == 1  # shared dictionaries


def test_batch_shared_byte_device_backend(rng):
    """backend='device' is honored by the shared-codebook byte path (r5
    review: it silently ran the host encoder)."""
    from glz_tpu import compress_batch, decompress
    from glz_tpu.core import container

    p = rng.dirichlet(np.ones(256) * 0.1)
    files = [rng.choice(256, size=70_000, p=p).astype(np.uint8).tobytes()
             for _ in range(2)]
    blobs = compress_batch(files, backend="device", shared_codebook=True)
    cbs = {container.read_container(b).codebook_blob for b in blobs}
    assert len(cbs) == 1
    for b, d in zip(blobs, files):
        assert decompress(b) == d


def test_shared_huffword_rows_cap_warns(text_100kb):
    import pytest

    from glz_tpu import compress_batch
    from glz_tpu.config import MODE_HUFFWORD, GlzConfig, LAYOUT_LOCKSTEP

    conf = GlzConfig(stream_symbols=1024, layout=LAYOUT_LOCKSTEP,
                     group_rows=64)
    with pytest.warns(UserWarning, match="VMEM budget"):
        compress_batch([text_100kb[:20_000]], mode=MODE_HUFFWORD, conf=conf,
                       shared_codebook=True)


def test_archive_peek_layout(rng, text_100kb):
    from glz_tpu import compress_archive
    from glz_tpu.config import GlzConfig, LAYOUT_LOCKSTEP
    from glz_tpu.core import container
    from glz_tpu.core.api import archive_peek_layout

    files = [text_100kb[:10_000], text_100kb[10_000:25_000]]
    arc0 = compress_archive(files)
    assert archive_peek_layout(arc0) == container.LAYOUT_BITSTREAM
    arc2 = compress_archive(files, conf=GlzConfig(stream_symbols=64,
                                                  layout=LAYOUT_LOCKSTEP))
    assert archive_peek_layout(arc2) == container.LAYOUT_LOCKSTEP

    import pytest
    with pytest.raises(ValueError):
        archive_peek_layout(b"NOPE" + arc0[4:])
    with pytest.raises(ValueError):
        archive_peek_layout(arc0[:10])
