import numpy as np
import pytest

from smalt_tpu.seq import codec
from smalt_tpu.align import core as ali
from smalt_tpu.align import diffstr as ds


@pytest.fixture(scope="module")
def matrix():
    return ali.make_score_matrix()


def _prof(seq, matrix):
    m, go, ge = matrix
    return ali.ScoreProfile.from_read(codec.encode(seq), m, go, ge,
                                      ali.matrix_lambda(m))


def test_perfect_match_score(matrix):
    p = _prof(b"ACGTACGTACGTACGTACGT", matrix)
    subj = codec.encode(b"ACGTACGTACGTACGTACGT")
    assert ali.sw_full_score(p, subj) == 20


def test_mismatch_score(matrix):
    p = _prof(b"ACGTACGTACGTACGTAAAACCCC", matrix)
    s = bytearray(b"ACGTACGTACGTACGTAAAACCCC")
    s[10] = ord("A")  # was G: mismatch costs 3 (drop 2, lose 1 match)
    assert ali.sw_full_score(p, codec.encode(bytes(s))) == 24 - 3


def test_gap_score(matrix):
    q = b"ACGTACGTACGTACGTAAAACCCC"
    s = q[:12] + q[13:]  # delete one base from subject
    p = _prof(q, matrix)
    # full SW: 23 matches, one insertion in query: 23 - 4 (open) = 19
    assert ali.sw_full_score(p, codec.encode(s)) == 19


def test_banded_equals_full_when_wide(matrix):
    rng = np.random.default_rng(7)
    q = bytes(rng.choice(list(b"ACGT"), 60).tolist())
    s = bytearray(q)
    s[20] = ord("ACGT"[(b"ACGT".index(s[20]) + 1) % 4])
    p = _prof(q, matrix)
    subj = codec.encode(bytes(s))
    full = ali.sw_full_score(p, subj)
    band = ali.align_band_fast(p, subj, -30, 30, 0, 59, 0, len(subj) - 1)
    assert band == full == 60 - 3


def test_recursive_traceback_cigar(matrix):
    q = b"AAAACCCCGGGGTTTTACGT"
    p = _prof(q, matrix)
    subj = codec.encode(b"TTTTT" + q + b"GGGGG")
    res = ali.align_band_recursive(p, subj, -10, 10, 0, len(q) - 1,
                                   0, len(subj) - 1, minscore=10,
                                   minscorlen=6)
    assert len(res) == 1
    r = res[0]
    assert r.score == 20
    assert (r.qs, r.qe) == (0, 19)
    assert (r.rs, r.re) == (5, 24)
    cig = ds.diffstr_to_cigar(r.diff, extended=True, silent_mismatch=True)
    assert cig == "20M"


def test_recursive_finds_secondary(matrix):
    q = b"AAAACCCCGGGGTTTTACGT"
    p = _prof(q, matrix)
    # two copies of the query separated by junk
    subj = codec.encode(q + b"TGCATGCATGCATGCATTGCAGCAT" + q)
    res = ali.align_band_recursive(p, subj, -70, 70, 0, len(q) - 1,
                                   0, len(subj) - 1, minscore=15,
                                   minscorlen=6)
    assert len(res) == 2
    assert {r.rs for r in res} == {0, 45}


def test_traceback_with_deletion_cigar(matrix):
    q = b"AAAACCCCGGGGTTTTACGTACGT"
    subj = codec.encode(q[:12] + b"T" + q[12:])  # extra ref base -> D
    p = _prof(q, matrix)
    res = ali.align_band_recursive(p, subj, -10, 10, 0, len(q) - 1,
                                   0, len(subj) - 1, minscore=10,
                                   minscorlen=6)
    best = max(res, key=lambda r: r.score)
    cig = ds.diffstr_to_cigar(best.diff, extended=True, silent_mismatch=True)
    # deletion position is ambiguous (run of Ts); the reference recurrence
    # places it at the last possible diagonal
    assert cig == "16M1D8M"
    assert best.score == 24 - 4
    assert ds.levenshtein(best.diff) == 1


def test_diffstr_reverse_roundtrip():
    # backward walk of 10 matches: S:10 then terminator
    back = [ds.setdiff(10, ds.DIFFCOD_S), 0]
    fwd = ds.diffstr_reverse(back)
    assert ds.diffstr_to_cigar(fwd, True, True) == "10M"
    assert ds.ali_len(fwd) == (10, 10)
