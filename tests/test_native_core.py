"""Differential tests: native C seeding/collation core (mapcore.c) vs
the pure-Python oracle implementations.

The Python implementations in seed/hitinfo.py, seed/hitlist.py and
segment/collate.py are the spec (themselves golden-tested against the
reference binary's output); the C core must reproduce them exactly on
randomized genomes/reads including Ns, quality thresholds, both
strands, short/plain hit info, and both hit-list collection modes.
"""
import contextlib
import tempfile

import numpy as np
import pytest

import smalt_tpu.native as native
from smalt_tpu.seq.refset import RefSet
from smalt_tpu.seq import codec
from smalt_tpu.index.table import build_index
from smalt_tpu.seed import hitinfo as hi_mod
from smalt_tpu.seed import hitlist as hl_mod
from smalt_tpu.segment import collate as seg_mod


@contextlib.contextmanager
def no_native():
    """Disable the native *mapcore* fast paths (the DP kernels in
    align/core.py stay native — they have no Python fallback)."""
    mods = (hi_mod, hl_mod, seg_mod)
    saved = [m._get_native for m in mods]
    for m in mods:
        m._get_native = lambda: None
    try:
        yield
    finally:
        for m, f in zip(mods, saved):
            m._get_native = f


@pytest.fixture(scope="module")
def setup():
    if native.get_lib() is None:
        pytest.skip("no C compiler for the native core")
    rng = np.random.default_rng(7)
    bases = np.array(list(b"ACGT"), np.uint8)
    L = 200_000
    g = rng.choice(bases, L)
    g[rng.integers(0, L, 50)] = ord("N")
    gs = g.tobytes().decode()
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fa:
        fa.write(">g1\n")
        for i in range(0, L, 60):
            fa.write(gs[i : i + 60] + "\n")
        path = fa.name
    refset = RefSet.from_fasta(path)
    idx = build_index(refset, 11, 3)
    return rng, gs, refset, idx


def _one_case(rng, gs, idx, t):
    qlen = int(rng.integers(20, 160))
    pos = int(rng.integers(0, len(gs) - qlen))
    s = list(gs[pos : pos + qlen])
    for j in np.flatnonzero(rng.random(qlen) < 0.03):
        s[j] = "ACGTN"[int(rng.integers(0, 5))]
    seq = codec.encode("".join(s).encode())
    qual = (bytes(np.asarray(rng.integers(35, 70, qlen), np.uint8))
            if t % 3 else None)
    out = []
    for is_rev in (False, True):
        try:
            h = hi_mod.collect_hit_info_short(
                seq, qual, is_rev, idx, 100, 16384, 5 if t % 4 == 0 else 0)
        except hi_mod.ShortSeqError:
            out.append(("short",))
            continue
        cd = hi_mod.cover_deficit(h)
        hl = hl_mod.collect_hits_using_cutoff(h, 100, idx)
        hl2 = hl_mod.collect_hits_for_segment(h, 1000, 150001, 100, True, idx)
        sac = seg_mod.SegAliCands()
        sac.blank()
        sgl = seg_mod.seg_lst_fill_hits(hl, 2)
        seg_mod.seg_cands_add_fast(sac, sgl, 18, 0)
        sgl2 = seg_mod.seg_lst_fill_hits(hl2, 1)
        seg_mod.seg_cands_add_fast(sac, sgl2, 18, 0)
        out.append((
            h.qmask.tolist(), h.qoffs.tolist(), h.nhits.tolist(),
            h.slot.tolist(), h.sidx.tolist(), h.seed_rank, cd,
            hl.sqdat.tolist(), hl.qmask.tolist(),
            hl2.sqdat.tolist(), hl2.qmask.tolist(),
            sgl.seed_sqo.tolist(), sgl.seed_len.tolist(),
            sgl.seg_ix.tolist(), sgl.seg_nseed.tolist(),
            sgl.seg_cover.tolist(),
            sgl.hreg_idx.tolist(), sgl.hreg_num.tolist(), sgl.maxcover,
            [(c.qs, c.qe, c.rs, c.re, c.shiftoffs, c.shift2mm, c.srange,
              c.cover, c.flag, c.nseg) for c in sac.cands],
            sac.max_cover, sac.max2nd_cover,
        ))
    return out


def test_native_matches_python(setup):
    rng, gs, refset, idx = setup
    # identical RNG streams for both passes
    seeds = [(int(rng.integers(1 << 30)), t) for t in range(40)]
    nat, pyo = [], []
    for sd, t in seeds:
        nat.append(_one_case(np.random.default_rng(sd), gs, idx, t))
    with no_native():
        for sd, t in seeds:
            pyo.append(_one_case(np.random.default_rng(sd), gs, idx, t))
    for i, (x, y) in enumerate(zip(nat, pyo)):
        assert x == y, f"case {i} diverged between C and Python cores"


def test_native_engine_end_to_end(setup):
    """Full rmap_single through both cores must agree result-for-result."""
    rng, gs, refset, idx = setup
    from smalt_tpu.map.engine import MapEngine, MapParams
    from smalt_tpu.seq.io import Read

    def run():
        eng = MapEngine(refset, idx, MapParams())
        r = np.random.default_rng(11)
        sams = []
        for i in range(25):
            qlen = int(r.integers(40, 140))
            pos = int(r.integers(0, len(gs) - qlen))
            s = list(gs[pos : pos + qlen])
            for j in np.flatnonzero(r.random(qlen) < 0.02):
                s[j] = "ACGT"[int(r.integers(0, 4))]
            read = Read(name=f"r{i}", seq=codec.encode("".join(s).encode()),
                        qual=b"5" * qlen)
            rs = eng.rmap_single(read)
            res = []
            for rr in rs.sortr:
                res.append((rr.swatscor, rr.q_start, rr.q_end, rr.s_start,
                            rr.s_end, rr.sidx, rr.status, rr.mapscor,
                            list(rr.diff)))
            sams.append(res)
        return sams

    a = run()
    with no_native():
        b = run()
    assert a == b
