"""Golden end-to-end tests: SAM output must be bit-identical to reference
SMALT 0.7.6 run as `smalt index -k 13 -s 4; smalt map -f sam -r 1` on the
bundled genome + simulated reads (fixtures generated with misc/simread).

This is the TPU analogue of the reference's Python test drivers
(test/mthread_test.py, test/cigar_test.py)."""
import gzip
import io
import os

import pytest

from smalt_tpu.cli import main


def _read_lines(path):
    if path.endswith(".gz"):
        with gzip.open(path, "rt") as f:
            return [l for l in f.read().splitlines() if not l.startswith("@")]
    with open(path) as f:
        return [l for l in f.read().splitlines() if not l.startswith("@")]


@pytest.fixture(scope="module")
def index_prefix(tmp_path_factory, data_dir):
    d = tmp_path_factory.mktemp("idx")
    pref = str(d / "idx")
    assert main(["index", "-k", "13", "-s", "4", pref,
                 os.path.join(data_dir, "genome.fa")]) == 0
    return pref


def test_single_end_bit_identical(index_prefix, data_dir, tmp_path):
    out = str(tmp_path / "se.sam")
    assert main(["map", "-f", "sam", "-r", "1", "-o", out, index_prefix,
                 os.path.join(data_dir, "reads_se.fq.gz")]) == 0
    got = _read_lines(out)
    want = _read_lines(os.path.join(data_dir, "golden_se_r1.sam.gz"))
    assert len(got) == len(want) == 2000
    assert got == want


def test_paired_end_bit_identical(index_prefix, data_dir, tmp_path):
    out = str(tmp_path / "pe.sam")
    assert main(["map", "-f", "sam", "-r", "1", "-o", out, index_prefix,
                 os.path.join(data_dir, "reads_pe_1.fq"),
                 os.path.join(data_dir, "reads_pe_2.fq")]) == 0
    got = _read_lines(out)
    want = _read_lines(os.path.join(data_dir, "golden_pe_r1.sam"))
    assert len(got) == len(want) == 240
    assert got == want
