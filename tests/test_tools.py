"""Tool-suite tests (misc/ equivalents) — simulate reads, map them, and
check that the truth encoded in the read names is recovered."""
import os

import pytest

from smalt_tpu.cli import main as smalt_main
from smalt_tpu.tools.__main__ import main as tools_main
from smalt_tpu.tools.sam import read_sam, SamLine


@pytest.fixture(scope="module")
def index_prefix(tmp_path_factory, data_dir):
    d = tmp_path_factory.mktemp("idx")
    pref = str(d / "idx")
    assert smalt_main(["index", "-k", "13", "-s", "4", pref,
                       os.path.join(data_dir, "genome.fa")]) == 0
    return pref


def test_simread_roundtrip(index_prefix, tmp_path):
    """Simulated reads map back to their source positions."""
    fq = str(tmp_path / "sim.fq")
    assert tools_main(["simread", index_prefix, "80", "200", "1", "n",
                       "0", "0", "42", "tt", fq]) == 0
    out = str(tmp_path / "sim.sam")
    assert smalt_main(["map", "-f", "sam", "-r", "1", "-o", out,
                       index_prefix, fq]) == 0
    good = total = 0
    for rec in read_sam(open(out)):
        total += 1
        _, num, seqnam, pos, sidx, strand, spec = rec.qname.split("_")
        if rec.is_mapped and rec.rname == seqnam and \
           abs(rec.pos - (int(pos) + 1)) <= 2:
            good += 1
    assert total == 200
    assert good >= 195  # a couple may be ambiguous/repeat-placed


def test_simread_paired(index_prefix, tmp_path):
    base = str(tmp_path / "pp")
    assert tools_main(["simread", index_prefix, "75", "100", "0", "n",
                       "300", "30", "7", "pp", base]) == 0
    assert os.path.exists(base + "_1.fq") and os.path.exists(base + "_2.fq")
    out = str(tmp_path / "pp.sam")
    assert smalt_main(["map", "-f", "sam", "-r", "1", "-o", out,
                       index_prefix, base + "_1.fq", base + "_2.fq"]) == 0
    proper = 0
    for rec in read_sam(open(out)):
        if rec.flag & 0x2:
            proper += 1
    assert proper >= 90  # most simulated pairs map as proper pairs


def test_readutils_chain(index_prefix, tmp_path, capsys):
    fq = str(tmp_path / "a.fq")
    tools_main(["simread", index_prefix, "60", "50", "0", "n", "0", "0",
                "3", "aa", fq])
    out = str(tmp_path / "sub.fq")
    assert tools_main(["splitreads", fq, "10", "20", out]) == 0
    assert sum(1 for l in open(out) if l.startswith("@aa")) == 10
    tr = str(tmp_path / "tr.fq")
    assert tools_main(["trunkreads", out, "30", tr]) == 0
    assert tools_main(["readstats", tr]) == 0
    cap = capsys.readouterr()
    assert "min/median/max length: 30/30/30" in cap.out
    mixed = str(tmp_path / "mix.fq")
    assert tools_main(["mixreads", out, tr, mixed]) == 0
    assert sum(1 for l in open(mixed) if l.startswith("@aa")) == 20


def test_fetchseq(index_prefix, capsys):
    assert tools_main(["fetchseq", index_prefix, "chr1", "0", "59"]) == 0
    cap = capsys.readouterr()
    lines = cap.out.splitlines()
    assert lines[0] == ">chr1:0-59"
    assert len(lines[1]) == 60


def test_sam_parser(data_dir):
    import gzip
    with gzip.open(os.path.join(data_dir, "golden_se_r1.sam.gz"), "rt") as f:
        recs = list(read_sam(f))
    assert len(recs) == 2000
    r = recs[0]
    assert r.is_mapped and r.is_reverse
    assert r.cigar_ops() == [(100, "M")]
    assert r.aligned_ref_len() == 100
    assert r.tags["NM"] == "0"
