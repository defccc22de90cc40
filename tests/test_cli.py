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


def test_cli_info_stats(sample, capsys):
    cli.main(["compress", str(sample)])
    assert cli.main(["info", str(sample) + ".glz", "--stats",
                     "--original", str(sample)]) == 0
    out = capsys.readouterr().out
    assert "average code length" in out and "predicted ratio" in out


def test_stats_predicted_matches_actual(sample):
    """predicted ratio (avg code length / 8) ~= payload_bits/(8*n_symbols):
    the container's payload is exactly the sum of per-symbol code lengths
    (plus <0.01% stream padding)."""
    import re

    from glz_tpu.cli import stats_report
    from glz_tpu.core import container
    from glz_tpu.core.codebook import histogram_bytes

    data = sample.read_bytes()
    cli.main(["compress", str(sample)])
    f = container.read_container((sample.parent / (sample.name + ".glz")).read_bytes())
    rep = stats_report(f, histogram_bytes(data))
    predicted = float(re.search(r"predicted ratio: ([0-9.]+)", rep).group(1))
    actual = float(re.search(r"actual payload ratio: ([0-9.]+)", rep).group(1))
    assert abs(predicted - actual) < 0.001


def test_cli_info_stats_huffword(sample, capsys):
    """Huffword stats parity (canonical_huffword.h:254-294): both dicts'
    token tables print, and the predicted (avg code length) ratio tracks
    the actual payload ratio."""
    import re

    out = str(sample) + ".w.glz"
    cli.main(["compress", str(sample), out, "--model", "huffword"])
    assert cli.main(["info", out, "--stats", "--original", str(sample)]) == 0
    rep = capsys.readouterr().out
    assert "word dictionary" in rep and "nonword dictionary" in rep
    assert "avg code length" in rep
    predicted = float(re.search(r"predicted ratio: ([0-9.]+)", rep).group(1))
    actual = float(re.search(r"actual ratio: ([0-9.]+)", rep).group(1))
    # actual includes <= one stream's worth of padding bits
    assert 0 < predicted <= actual + 1e-6
    assert abs(predicted - actual) < 0.01


def test_cli_info_stats_normal_tree(sample, capsys):
    """Normal-tree stats parity (normal_huff_encoder.h:204-271)."""
    out = str(sample) + ".nt.glz"
    cli.main(["compress", str(sample), out, "--model", "normal_tree"])
    assert cli.main(["info", out, "--stats", "--original", str(sample)]) == 0
    rep = capsys.readouterr().out
    assert "average code length" in rep and "predicted ratio" in rep
    assert "length  code" in rep


def test_cli_preset_and_layout(sample):
    out = str(sample) + ".ls.glz"
    assert cli.main(["compress", str(sample), out, "--preset", "throughput",
                     "--checksum"]) == 0
    assert cli.main(["info", out]) == 0
    assert cli.main(["decompress", out]) == 0
    assert pathlib.Path(out + ".de").read_bytes() == sample.read_bytes()


def test_cli_normal_tree_front_door(sample):
    out = str(sample) + ".nt.glz"
    assert cli.main(["compress", str(sample), out, "--model", "normal_tree"]) == 0
    assert cli.main(["decompress", out]) == 0
    assert pathlib.Path(out + ".de").read_bytes() == sample.read_bytes()


def test_cli_compat_flag(sample):
    assert cli.main(["compress", str(sample), "--compat", "crs2"]) == 0
    assert cli.main(["decompress", str(sample) + ".crs2"]) == 0
    assert pathlib.Path(str(sample) + ".crs2.de").read_bytes() == sample.read_bytes()


def test_cli_info_dot_tree(sample, tmp_path, capsys):
    """--dot renders the normal-tree codec's Huffman tree as Graphviz DOT
    (the reference's DEBUG2 visualizer, huff_tree.cc:12-136, without the
    Boost.Python/pygraphviz machinery)."""
    out = str(sample) + ".nt.glz"
    cli.main(["compress", str(sample), out, "--model", "normal_tree"])
    dot = tmp_path / "tree.dot"
    assert cli.main(["info", out, "--dot", str(dot)]) == 0
    text = dot.read_text()
    assert text.startswith("digraph hufftree")
    # every internal node has exactly a 0-edge and a 1-edge
    assert text.count('[label="0"]') == text.count('[label="1"]') > 10
    # byte-mode containers have no explicit tree
    cli.main(["compress", str(sample)])
    assert cli.main(["info", str(sample) + ".glz", "--dot", str(dot)]) == 2


def test_cli_group_rows_flag(sample):
    out = str(sample) + ".g16.glz"
    assert cli.main(["compress", str(sample), out, "--layout", "lockstep",
                     "--stream-symbols", "64", "--group-rows", "16"]) == 0
    from glz_tpu.core import container
    f = container.read_container(pathlib.Path(out).read_bytes())
    assert f.group_rows == 16
    assert cli.main(["decompress", out]) == 0
    assert pathlib.Path(out + ".de").read_bytes() == sample.read_bytes()


def test_cli_archive_roundtrip(tmp_path, text_100kb):
    """archive/unarchive subcommands: shared-codebook .glzb via the CLI."""
    from glz_tpu.cli import main

    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_bytes(text_100kb[:30_000])
    b.write_bytes(text_100kb[30_000:55_000])
    arc = tmp_path / "x.glzb"
    assert main(["archive", str(arc), str(a), str(b), "--checksum"]) == 0
    ao, bo = tmp_path / "a.out", tmp_path / "b.out"
    assert main(["unarchive", str(arc), str(ao), str(bo)]) == 0
    assert ao.read_bytes() == a.read_bytes()
    assert bo.read_bytes() == b.read_bytes()


def test_cli_unarchive_wrong_count(tmp_path, text_100kb):
    from glz_tpu.cli import main

    a = tmp_path / "a.txt"
    a.write_bytes(text_100kb[:10_000])
    arc = tmp_path / "x.glzb"
    assert main(["archive", str(arc), str(a)]) == 0
    assert main(["unarchive", str(arc), str(tmp_path / "1"),
                 str(tmp_path / "2")]) == 2


def test_cli_info_archive(tmp_path, text_100kb, capsys):
    from glz_tpu.cli import main

    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_bytes(text_100kb[:12_000])
    b.write_bytes(text_100kb[12_000:20_000])
    arc = tmp_path / "x.glzb"
    assert main(["archive", str(arc), str(a), str(b)]) == 0
    capsys.readouterr()
    assert main(["info", str(arc)]) == 0
    out = capsys.readouterr().out
    assert "archive mode=canonical_byte files=2" in out
    assert "file 0: symbols=12000" in out
    assert "file 1: symbols=8000" in out
