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


def test_band_fast_pinned_left_edge(matrix):
    """Quirk (3) of the reference's score-only banded walk
    (alignSmiWatBandFast, alignment.c:1219): when the band enters left
    of the query segment (q_left > l_edge), the LEFT edge never
    advances — delta_band_start is tested but never decremented, unlike
    the tracked pass-2 walk — so pass-1 can score alignments far off
    the nominal diagonals.  Case minted from a live-reference
    differential (parity soak seed 2000006): the true 7-base match sits
    at diagonal -8, outside the nominal band [-4, 0]; a sliding band
    scores 5, the reference scores 7."""
    subj = codec.encode(b"CCTTAATCAGATCAGCAG")
    p = _prof(b"AGATCAGTCTACAG", matrix)       # read RC, as a rev cand
    got = ali.align_band_fast(p, subj, -4, 0, 0, 13, 0, len(subj) - 1)
    assert got == 7
    # the tracked pass-2 walk DOES slide: its optimum within the band
    # is the in-band 5-base match
    band = ali.AliBand.make(-4, 0, 0, 13, p.qlen, 0, len(subj) - 1,
                            len(subj))
    sc, _, _, _ = ali._align_band_track(
        p, np.ascontiguousarray(codec.alpha(subj), np.uint8), band)
    assert sc == 5


def test_add_from_ali_slot_dance():
    """resultSetAddFromAli's verbatim slot/ARRLEN bugs
    (results.c:1884-1940): a new result immediately after a dropped
    duplicate is written to the uncounted slot and silently lost —
    ARRNEXTP (array.h:71) hands the SAME slot to whatever comes next —
    though it still bumps the swatscor maxima.  Minted from a
    live-reference differential (parity soak seed 2000009, read
    pr0100)."""
    from smalt_tpu.results.result import ResultSet

    def ar(score, qs, qe, rs, re):
        return ali.AliResult(score=score, qs=qs, qe=qe, rs=rs, re=re,
                             diff=[score + 1])

    # batch 1: one result
    rs = ResultSet()
    rs.add_from_ali([ar(6, 40, 45, 25, 30)], 27601, 0, 52, 0, True)
    assert len(rs.results) == 1
    # batch 2: [duplicate-of-last, new] -> the new one is ORPHANED
    rs.add_from_ali([ar(6, 40, 45, 12, 17), ar(7, 8, 13, 72, 77)],
                    27614, 0, 52, 0, True)
    assert len(rs.results) == 1
    # ...but its score still reached the maxima
    assert rs.swatscor_max == 7
    # batch 3: a following result does NOT resurrect the post-dup
    # orphan — ARRNEXTP reuses its slot, so the 7 is overwritten by
    # the 5 and only the 5 is counted
    rs2 = ResultSet()
    rs2.add_from_ali([ar(6, 40, 45, 25, 30)], 27601, 0, 52, 0, True)
    rs2.add_from_ali([ar(6, 40, 45, 12, 17), ar(7, 8, 13, 72, 77),
                      ar(5, 20, 25, 40, 45)],
                     27614, 0, 52, 0, True)
    assert [r.swatscor for r in rs2.results] == [6, 5]
    assert rs2.swatscor_max == 7
