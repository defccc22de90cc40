"""CLI round trips, including the utet emulation modes (test.cc:286-317)."""

import pathlib

import pytest

from glz_tpu import cli


@pytest.fixture
def sample(tmp_path, text_100kb):
    p = tmp_path / "sample.txt"
    p.write_bytes(text_100kb[:30_000])
    return p


def test_cli_roundtrip_glz(sample):
    assert cli.main(["compress", str(sample)]) == 0
    assert cli.main(["decompress", str(sample) + ".glz"]) == 0
    assert pathlib.Path(str(sample) + ".glz.de").read_bytes() == sample.read_bytes()


def test_cli_huffword(sample):
    out = str(sample) + ".w.glz"
    assert cli.main(["compress", str(sample), out, "--model", "huffword"]) == 0
    assert cli.main(["decompress", out]) == 0
    assert pathlib.Path(out + ".de").read_bytes() == sample.read_bytes()


def test_cli_utet_modes(sample):
    # canonical: mode 3 compress, 4/5/6 decompress
    assert cli.main(["utet", str(sample), "3"]) == 0
    for m in ("4", "5", "6"):
        assert cli.main(["utet", str(sample) + ".crs2", m]) == 0
        assert pathlib.Path(str(sample) + ".crs2.de").read_bytes() == sample.read_bytes()
    # normal: mode 1 compress, 2 decompress
    assert cli.main(["utet", str(sample), "1"]) == 0
    assert cli.main(["utet", str(sample) + ".crs", "2"]) == 0
    assert pathlib.Path(str(sample) + ".crs.de").read_bytes() == sample.read_bytes()


def test_cli_info(sample, capsys):
    cli.main(["compress", str(sample)])
    assert cli.main(["info", str(sample) + ".glz"]) == 0
    out = capsys.readouterr().out
    assert "canonical_byte" in out and "streams=" in out


def test_cli_compat_flag(sample):
    assert cli.main(["compress", str(sample), "--compat", "crs2"]) == 0
    assert cli.main(["decompress", str(sample) + ".crs2"]) == 0
    assert pathlib.Path(str(sample) + ".crs2.de").read_bytes() == sample.read_bytes()
