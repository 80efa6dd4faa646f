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


def test_recursive_cplx_native_matches_python(matrix):
    """-w path: C mc_align_recursive with use_cplx must reproduce the
    Python CplxCounter oracle (scaleALICPLX, alignment.c:268) on random
    low/high-complexity subjects, including the recursion split."""
    from smalt_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    for trial in range(30):
        # alternate high-complexity random and low-complexity AT-rich
        pool = b"ACGT" if trial % 2 == 0 else b"AATATTAC"
        q = bytes(rng.choice(list(pool), 48).tolist())
        s = bytearray(q + bytes(rng.choice(list(pool), 30).tolist()) + q)
        for _ in range(3):   # sprinkle mismatches
            i = int(rng.integers(0, len(s)))
            s[i] = pool[int(rng.integers(0, 4)) % len(pool)]
        p = _prof(q, matrix)
        subj = codec.encode(bytes(s))
        want = []
        ali._recurse(p, np.ascontiguousarray(codec.alpha(subj), np.uint8),
                     p.qlen, len(subj), -40, 40, 0, len(q) - 1,
                     0, len(subj) - 1, 12, 6,
                     ali.CplxCounter(p.lam), want)
        got = ali.align_band_recursive(p, subj, -40, 40, 0, len(q) - 1,
                                       0, len(subj) - 1, minscore=12,
                                       minscorlen=6, use_cplx=True)
        assert [(r.score, r.qs, r.qe, r.rs, r.re, list(r.diff))
                for r in got] == \
               [(r.score, r.qs, r.qe, r.rs, r.re, list(r.diff))
                for r in want]
