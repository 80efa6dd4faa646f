"""Device SW kernel vs the exact host C kernel (swsimd semantics)."""
import numpy as np
import pytest

from smalt_tpu.seq import codec
from smalt_tpu.align import core as ali
from smalt_tpu.ops.sw import sw_score_batch, sw_score_ref


@pytest.fixture(scope="module")
def setup():
    m, go, ge = ali.make_score_matrix()
    lam = ali.matrix_lambda(m)
    return m, go, ge, lam


def _host_score(q, s, setup):
    m, go, ge, lam = setup
    p = ali.ScoreProfile.from_read(codec.encode(q), m, go, ge, lam)
    return ali.sw_full_score(p, codec.encode(s))


def _rand_seqs(rng, n, qlen, slen, mut=0.05):
    cases = []
    for _ in range(n):
        q = rng.choice(list(b"ACGT"), qlen)
        s = np.concatenate([rng.choice(list(b"ACGT"), 7), q.copy(),
                            rng.choice(list(b"ACGT"), slen - qlen - 7)])
        muts = rng.random(len(s)) < mut
        s[muts] = rng.choice(list(b"ACGT"), int(muts.sum()))
        cases.append((bytes(q.tolist()), bytes(s.tolist())))
    return cases


def test_jnp_ref_matches_host(setup):
    m, go, ge, lam = setup
    rng = np.random.default_rng(11)
    cases = _rand_seqs(rng, 16, 100, 160)
    qc = np.stack([codec.alpha(codec.encode(q)) for q, s in cases]).astype(np.int32)
    sc = np.stack([codec.alpha(codec.encode(s)) for q, s in cases]).astype(np.int32)
    slens = np.full(len(cases), sc.shape[1], np.int32)
    got = np.asarray(sw_score_ref(qc, sc, slens, m, -go, -ge))
    want = np.array([_host_score(q, s, setup) for q, s in cases])
    assert np.array_equal(got, want)


def test_pallas_kernel_matches_host(setup):
    m, go, ge, lam = setup
    rng = np.random.default_rng(23)
    cases = _rand_seqs(rng, 8, 128, 256, mut=0.1)
    qc = np.stack([codec.alpha(codec.encode(q)) for q, s in cases]).astype(np.int32)
    sc = np.stack([codec.alpha(codec.encode(s)) for q, s in cases]).astype(np.int32)
    slens = np.full(len(cases), sc.shape[1], np.int32)
    got = np.asarray(sw_score_batch(qc, sc, slens, m, -go, -ge))
    want = np.array([_host_score(q, s, setup) for q, s in cases])
    assert np.array_equal(got, want)


def test_padded_subject_rows_ignored(setup):
    m, go, ge, lam = setup
    q = b"ACGTACGTACGTACGTACGTACGTACGTACGT"
    s = b"TTTT" + q + b"GG"
    qc = codec.alpha(codec.encode(q)).astype(np.int32)[None]
    s_pad = codec.alpha(codec.encode(s + q)).astype(np.int32)[None]  # junk past slen
    slens = np.array([len(s)], np.int32)
    got = int(np.asarray(sw_score_ref(qc, s_pad, slens, m, -go, -ge))[0])
    assert got == _host_score(q, s, setup) == 32


def test_nonstd_bases_score_zero(setup):
    m, go, ge, lam = setup
    q = b"ACGTNACGTACGTACGTNNACGTACGTACGTA"
    s = b"CC" + q + b"AA"
    qc = codec.alpha(codec.encode(q)).astype(np.int32)[None]
    sc = codec.alpha(codec.encode(s)).astype(np.int32)[None]
    slens = np.array([len(s)], np.int32)
    got = int(np.asarray(sw_score_ref(qc, sc, slens, m, -go, -ge))[0])
    assert got == _host_score(q, s, setup)
