"""C pair lane (fl_map_pair_block) byte-parity against the pure-Python
engine on a repeat-planted genome that exercises every covered branch:
the restricted common flow, the unrestricted remap (append), and the
fine re-hash continuation."""
import io
import os

import numpy as np
import pytest

from smalt_tpu import rand
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams
from smalt_tpu.map.pipeline import run_pipeline
from smalt_tpu.seq.io import PairedReader
from smalt_tpu.seq.refset import RefSet


@pytest.fixture(scope="module")
def pe_workload(tmp_path_factory):
    d = tmp_path_factory.mktemp("pairlane")
    rng = np.random.default_rng(42)
    bases = np.array(list(b"ACGT"), np.uint8)
    g = rng.choice(bases, 300_000)
    # dispersed near-identical repeat copies force weak first-mapping
    # mapqs (the remap branch) and score-improving re-maps (fine)
    unit = rng.choice(bases, 900)
    for _ in range(25):
        cp = unit.copy()
        for j in rng.integers(0, len(cp), 9):
            cp[j] = bases[int(rng.integers(0, 4))]
        at = int(rng.integers(0, len(g) - len(cp)))
        g[at:at + len(cp)] = cp
    genome = g.tobytes().decode()
    fa = d / "g.fa"
    fa.write_text(">chr\n" + "\n".join(
        genome[i:i + 60] for i in range(0, len(genome), 60)) + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    N, RL = 400, 120
    fq1, fq2 = d / "r1.fq", d / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(N):
            ins = int(rng.normal(360, 40))
            ins = max(2 * RL + 10, min(560, ins))
            st = int(rng.integers(0, len(genome) - ins))
            frag = genome[st:st + ins]
            a = list(frag[:RL])
            b = list(frag[-RL:])
            for arr in (a, b):
                for j in np.flatnonzero(rng.random(RL) < 0.01):
                    arr[j] = "ACGT"[int(rng.integers(0, 4))]
            f1.write(f"@p{i}\n{''.join(a)}\n+\n{'5' * RL}\n")
            f2.write(f"@p{i}\n{''.join(b).translate(comp)[::-1]}\n+\n"
                     f"{'5' * RL}\n")
    refset = RefSet.from_fasta(str(fa))
    idx = build_index(refset, 13, 2)
    _ = idx.addrs
    return refset, idx, str(fq1), str(fq2)


def _run(refset, idx, fq1, fq2, no_lane):
    if no_lane:
        os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
    else:
        os.environ.pop("SMALT_TPU_NO_FASTLANE", None)
    try:
        rand.ranseed(1)
        eng = MapEngine(refset, idx, MapParams())
        sink = io.StringIO()
        run_pipeline(eng, PairedReader(fq1, fq2), sink, refset)
        return sink.getvalue()
    finally:
        os.environ.pop("SMALT_TPU_NO_FASTLANE", None)


def test_pair_lane_byte_identical(pe_workload):
    refset, idx, fq1, fq2 = pe_workload
    import smalt_tpu.map.fastlane as FL
    stats = {"c": 0, "oracle": 0, "blocks": 0}
    orig_call = FL.PairLane._call
    orig_rb = FL.PairLane.render_block

    def call(self, A, B):
        r = orig_call(self, A, B)
        if r is not None:
            stats["c"] += r[1]
        return r

    def rb(self, block, oracle):
        stats["blocks"] += 1

        def o2(item):
            stats["oracle"] += 1
            return oracle(item)
        return orig_rb(self, block, o2)

    FL.PairLane._call = call
    FL.PairLane.render_block = rb
    try:
        c_text = _run(refset, idx, fq1, fq2, no_lane=False)
    finally:
        FL.PairLane._call = orig_call
        FL.PairLane.render_block = orig_rb
    py_text = _run(refset, idx, fq1, fq2, no_lane=True)
    assert c_text == py_text
    # the lane must actually carry the load (fine/remap included)
    assert stats["blocks"] > 0
    assert stats["c"] >= 390, stats


def _run_w(refset, idx, fq1, fq2, no_lane):
    """Same as _run but with -w (complexity weighting) switched on."""
    from smalt_tpu.map.engine import RMAPFLG_CMPLXW
    if no_lane:
        os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        os.environ["SMALT_TPU_NO_PAIRNATIVE"] = "1"
    try:
        rand.ranseed(1)
        p = MapParams(use_cplx=True)
        p.rmapflg |= RMAPFLG_CMPLXW
        eng = MapEngine(refset, idx, p)
        sink = io.StringIO()
        run_pipeline(eng, PairedReader(fq1, fq2), sink, refset)
        return sink.getvalue()
    finally:
        os.environ.pop("SMALT_TPU_NO_FASTLANE", None)
        os.environ.pop("SMALT_TPU_NO_PAIRNATIVE", None)


def test_pair_lane_cplx_byte_identical(pe_workload):
    """-w through the C pair lane == the Python CplxCounter oracle."""
    refset, idx, fq1, fq2 = pe_workload
    c_text = _run_w(refset, idx, fq1, fq2, no_lane=False)
    py_text = _run_w(refset, idx, fq1, fq2, no_lane=True)
    assert c_text == py_text


@pytest.mark.parametrize("fmt", ["cigar", "ssaha", "gff"])
def test_pair_lane_alt_formats_byte_identical(pe_workload, fmt):
    """Paired -f cigar / -f ssaha through the C pair lane (flrep_write
    out_fmt dispatch, /1 /2 kept in qnames, per-record CONTIG labels)
    must equal the Python ReportWriter byte-for-byte."""
    refset, idx, fq1, fq2 = pe_workload

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            eng = MapEngine(refset, idx, MapParams())
            sink = io.StringIO()
            run_pipeline(eng, PairedReader(fq1, fq2), sink, refset,
                         fmt=fmt)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    c_text = run(False)
    py_text = run(True)
    assert c_text == py_text
    tag = {"cigar": "cigar:", "ssaha": "alignment:", "gff": "gff: "}[fmt]
    assert c_text.startswith(tag)


def test_pair_lane_ihist_byte_identical(pe_workload):
    """-g (insert histogram) through the C pair lane: the cumulative-
    count weighting in flp_assign_prob (resultpairs.c:787-801) must
    reproduce the Python _assign_probabilities byte-for-byte, and the
    lane must actually carry the block (no ihist fallback)."""
    from smalt_tpu.results.insert import InsHist, InsSample
    refset, idx, fq1, fq2 = pe_workload
    samp = InsSample()
    srng = np.random.default_rng(7)
    for v in srng.normal(360, 40, 4000):
        samp.add(max(250, min(560, int(v))))
    ihist = InsHist.from_sample(samp)
    ihist.smooth_gauss()

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            p = MapParams()
            p.insert_min = min(p.insert_min, ihist.insizlo)
            p.insert_max = max(p.insert_max, ihist.insizhi)
            eng = MapEngine(refset, idx, p)
            sink = io.StringIO()
            run_pipeline(eng, PairedReader(fq1, fq2), sink, refset,
                         ihist=ihist)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    import smalt_tpu.map.fastlane as FL
    stats = {"c": 0}
    orig_call = FL.PairLane._call

    def call(self, A, B):
        r = orig_call(self, A, B)
        if r is not None:
            stats["c"] += r[1]
        return r

    FL.PairLane._call = call
    try:
        c_text = run(False)
    finally:
        FL.PairLane._call = orig_call
    py_text = run(True)
    assert c_text == py_text
    assert stats["c"] >= 390, stats    # the lane must carry the load


def test_pair_lane_d0_byte_identical(pe_workload):
    """Paired -d 0 (report ALL best-scoring pairings: RESULTFLG_BEST
    without SINGLE/RANDSEL, reference map -H: 'for paired reads only
    -d 0 is supported') through the C pair lane must equal the Python
    oracle byte-for-byte on the repeat-heavy workload (remap + fine
    re-hash branches included)."""
    from smalt_tpu.results.pairs import RESULTFLG_BEST
    refset, idx, fq1, fq2 = pe_workload

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            p = MapParams()
            p.rsltouflg = RESULTFLG_BEST          # -d 0: no SINGLE sel
            eng = MapEngine(refset, idx, p)
            sink = io.StringIO()
            run_pipeline(eng, PairedReader(fq1, fq2), sink, refset)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    import smalt_tpu.map.fastlane as FL
    stats = {"c": 0}
    orig_call = FL.PairLane._call

    def call(self, A, B):
        r = orig_call(self, A, B)
        if r is not None:
            stats["c"] += r[1]
        return r

    FL.PairLane._call = call
    try:
        c_text = run(False)
    finally:
        FL.PairLane._call = orig_call
    py_text = run(True)
    assert c_text == py_text
    assert stats["c"] >= 390, stats    # the lane must carry the load


@pytest.mark.parametrize("fmt", ["sam", "cigar"])
def test_raw_pairs_byte_identical(pe_workload, fmt):
    """The serial bulk PE path (run_pipeline_raw_pairs: C FASTQ
    parsing + raw-bytes pair lane, base encoding and name cutting in
    fl_map_pair_block) must equal the regular PairedReader pipeline
    byte-for-byte."""
    from smalt_tpu.map.pipeline import run_pipeline_raw_pairs
    refset, idx, fq1, fq2 = pe_workload

    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    raw_sink = io.StringIO()
    ok = run_pipeline_raw_pairs(eng, fq1, fq2, raw_sink, refset, fmt=fmt)
    assert ok

    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    reg_sink = io.StringIO()
    run_pipeline(eng, PairedReader(fq1, fq2), reg_sink, refset, fmt=fmt)
    assert raw_sink.getvalue() == reg_sink.getvalue()


def test_raw_pairs_oracle_resume(pe_workload):
    """When the native pair call stops mid-batch, the raw path must
    replay exactly the stopping pair through the Python oracle and
    resume — byte-identical to the all-Python run."""
    import smalt_tpu.map.fastlane as FL
    from smalt_tpu.map.pipeline import run_pipeline_raw_pairs
    refset, idx, fq1, fq2 = pe_workload

    stats = {"calls": 0, "oracle": 0}
    orig = FL.PairLane._call_arrays

    def call(self, n, arrA, arrB, ascii_codes, names_raw):
        stats["calls"] += 1
        if n > 5:
            # render only the first 5 pairs: to the caller this is
            # indistinguishable from a native stop at pair 5, so pair
            # 5 must replay through the Python oracle
            return orig(self, 5, arrA, arrB, ascii_codes, names_raw)
        return orig(self, n, arrA, arrB, ascii_codes, names_raw)

    FL.PairLane._call_arrays = call
    try:
        rand.ranseed(1)
        eng = MapEngine(refset, idx, MapParams())
        raw_sink = io.StringIO()
        ok = run_pipeline_raw_pairs(eng, fq1, fq2, raw_sink, refset)
        assert ok
    finally:
        FL.PairLane._call_arrays = orig

    os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
    try:
        rand.ranseed(1)
        eng = MapEngine(refset, idx, MapParams())
        py_sink = io.StringIO()
        run_pipeline(eng, PairedReader(fq1, fq2), py_sink, refset)
    finally:
        os.environ.pop("SMALT_TPU_NO_FASTLANE", None)
    assert stats["calls"] >= 10         # the forced stops actually hit
    assert raw_sink.getvalue() == py_sink.getvalue()
