"""Differential stress test: the SSE2 striped full-matrix SW kernel
(dispatched inside native sw_full) must match the scalar reference
recurrence exactly over randomized sequences, scores and gap params.

The scalar kernel is exported only through the dispatcher, so the
oracle here is a NumPy re-implementation of the identical recurrence.
"""
import numpy as np
import pytest

from smalt_tpu.native import get_lib
from smalt_tpu.align import core as ali


def _scalar_oracle(W, qcount, subj, gap_init, gap_ext):
    qlen = W.shape[1]
    H = np.zeros(qlen, np.int64)
    E = np.zeros(qlen, np.int64)
    best = 0
    for a in subj:
        F = 0
        Hdiag = 0
        rs = W[a & 7]
        for j in range(qlen):
            Hp = Hdiag + int(rs[j])
            if Hp > best:
                best = Hp
            h = max(Hp, int(E[j]), F, 0)
            Hdiag = int(H[j])
            H[j] = h
            hg = h - gap_init
            E[j] = max(int(E[j]) - gap_ext, hg)
            F = max(F - gap_ext, hg)
    return best


@pytest.mark.parametrize("seed", range(4))
def test_sw_full_matches_oracle(seed):
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(seed)
    for case in range(60):
        qlen = int(rng.integers(16, 200))
        slen = int(rng.integers(1, 300))
        match = int(rng.integers(1, 12))
        mism = -int(rng.integers(1, 12))
        gi = int(rng.integers(1, 14))
        ge = int(rng.integers(1, 14))
        m, go, ge_s = ali.make_score_matrix(match, mism, -gi, -ge)
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        subj = rng.integers(0, 4, slen).astype(np.uint8)
        # plant a noisy copy of the query to get interesting optima
        if case % 2 and slen > qlen:
            st = int(rng.integers(0, slen - qlen))
            noisy = q.copy()
            flips = rng.random(qlen) < 0.1
            noisy[flips] = (noisy[flips] + 1) % 4
            subj[st : st + qlen] = noisy
        prof = ali.ScoreProfile.from_read(q, m, go, ge_s, 1.0)
        got = ali.sw_full_score(prof, subj)
        want = _scalar_oracle(prof.W, qlen, subj, gi, ge)
        assert got == want, (seed, case, qlen, slen, match, mism, gi, ge)


def test_sw_full_long_query_int16_boundary():
    """Scores near/above the int16 ceiling must fall back to scalar."""
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler")
    m, go, ge = ali.make_score_matrix(127, -2, -4, -3)
    q = np.zeros(400, np.uint8)            # all A
    subj = np.zeros(400, np.uint8)         # perfect match: 400*127 = 50800
    prof = ali.ScoreProfile.from_read(q, m, go, ge, 1.0)
    got = ali.sw_full_score(prof, subj)
    assert got == 400 * 127


@pytest.mark.parametrize("seed", range(2))
def test_sw_prof8_prepared_matches_sw_full(seed):
    """The per-read prepared-profile entries (sw_prof8_set/score) must
    agree with the one-shot dispatcher exactly: same scores when the
    8-bit run succeeds, and the documented fallback (sw_full_wide)
    recovering identical scores when it refuses (build -1 on range/gap
    shape, score -1 on possible saturation)."""
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(100 + seed)
    for case in range(40):
        qlen = int(rng.integers(16, 200))
        match = int(rng.integers(1, 12))
        mism = -int(rng.integers(1, 12))
        gi = int(rng.integers(1, 14))
        ge = int(rng.integers(1, max(2, gi + 1)))   # mostly ge <= gi
        if case % 7 == 0:
            ge = gi + 3                             # force build refusal
        m, go, ge_s = ali.make_score_matrix(match, mism, -gi, -ge)
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        prof = ali.ScoreProfile.from_read(q, m, go, ge_s, 1.0)
        slot = case & 1
        built = lib.sw_prof8_set(slot, prof.W_addr, qlen, gi, ge)
        # several windows against ONE build — the reuse the lane relies on
        for w in range(4):
            slen = int(rng.integers(1, 300))
            subj = rng.integers(0, 4, slen).astype(np.uint8)
            if w % 2 and slen > qlen:
                st = int(rng.integers(0, slen - qlen))
                noisy = q.copy()
                flips = rng.random(qlen) < 0.1
                noisy[flips] = (noisy[flips] + 1) % 4
                subj[st : st + qlen] = noisy
            want = _scalar_oracle(prof.W, qlen, subj, gi, ge)
            subj_c = np.ascontiguousarray(subj)
            r8 = (lib.sw_prof8_score(slot, subj_c.ctypes.data, slen)
                  if built == 0 else -1)
            if r8 >= 0:
                assert r8 == want, (seed, case, w, qlen, slen)
            else:
                Hb = np.zeros(qlen + slen + 8, np.int32)
                Eb = np.zeros(qlen + slen + 8, np.int32)
                wide = lib.sw_full_wide(prof.W_addr, qlen,
                                        subj_c.ctypes.data, slen, gi, ge,
                                        Hb.ctypes.data, Eb.ctypes.data)
                assert wide == want, (seed, case, w, qlen, slen)


def test_sw_prof8_saturation_refusal():
    """A perfect long high-score match must refuse in 8-bit (score -1,
    >= 255 - bias) — the condition the lane relies on to retry wide."""
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler")
    m, go, ge = ali.make_score_matrix(9, -2, -4, -3)
    q = np.zeros(64, np.uint8)
    prof = ali.ScoreProfile.from_read(q, m, go, ge, 1.0)
    assert lib.sw_prof8_set(0, prof.W_addr, 64, 4, 3) == 0
    subj = np.zeros(64, np.uint8)   # perfect: 64*9 = 576 > 8-bit range
    assert lib.sw_prof8_score(0, subj.ctypes.data, 64) == -1
