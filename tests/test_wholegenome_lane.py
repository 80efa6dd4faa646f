"""Whole-genome (non seq-by-seq) C lane: references with >= 512
sequences clear RMAPFLG_SEQBYSEQ (smalt.c:65-68) and collect hits over
the whole concat with post-pass-2 sequence assignment
(assignSequenceIndex, results.c:1695-1780).  The C lane runs this
regime natively (mode-0 collection + rs_assign_seqidx); an alignment
spanning a concatenated-sequence boundary needs splitMultiSpan's
re-alignment and falls back per block/pair to the Python oracle.

The genome600 golden fixture (71 bp sequences, 100 bp reads) makes
EVERY alignment multi-span, so it exercises only the fallback; this
test uses realistic contig sizes so the lane itself carries the load.
"""
import io
import os

import numpy as np
import pytest

from smalt_tpu import rand
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams, RMAPFLG_SEQBYSEQ
from smalt_tpu.map.pipeline import run_pipeline
from smalt_tpu.seq.io import FastqReader, PairedReader
from smalt_tpu.seq.refset import RefSet


@pytest.fixture(scope="module")
def contigs560(tmp_path_factory):
    d = tmp_path_factory.mktemp("wg560")
    rng = np.random.default_rng(99)
    bases = np.array(list(b"ACGT"), np.uint8)
    nctg, clen = 560, 2000
    ctgs = [rng.choice(bases, clen).tobytes().decode()
            for _ in range(nctg)]
    fa = d / "g.fa"
    with open(fa, "w") as f:
        for i, c in enumerate(ctgs):
            f.write(f">ctg{i}\n")
            for j in range(0, clen, 60):
                f.write(c[j:j + 60] + "\n")
    fq = d / "r.fq"
    with open(fq, "w") as f:
        for i in range(600):
            ci = int(rng.integers(0, nctg))
            st = int(rng.integers(0, clen - 100))
            s = list(ctgs[ci][st:st + 100])
            for j in np.flatnonzero(rng.random(100) < 0.01):
                s[j] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f"@r{i}\n{''.join(s)}\n+\n{'5' * 100}\n")
        # boundary-spanning chimeras: splitMultiSpan territory — the
        # lane must fall back (whole block) and stay byte-identical
        for i in range(8):
            ci = int(rng.integers(0, nctg - 1))
            s = ctgs[ci][-50:] + ctgs[ci + 1][:50]
            f.write(f"@b{i}\n{s}\n+\n{'5' * 100}\n")
    comp = str.maketrans("ACGT", "TGCA")
    fq1, fq2 = d / "r1.fq", d / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(300):
            ci = int(rng.integers(0, nctg))
            ins = int(rng.integers(260, 420))
            st = int(rng.integers(0, clen - ins))
            frag = ctgs[ci][st:st + ins]
            a = list(frag[:100])
            b = list(frag[-100:])
            for arr in (a, b):
                for j in np.flatnonzero(rng.random(100) < 0.01):
                    arr[j] = "ACGT"[int(rng.integers(0, 4))]
            f1.write(f"@p{i}\n{''.join(a)}\n+\n{'5' * 100}\n")
            f2.write(f"@p{i}\n{''.join(b).translate(comp)[::-1]}\n+\n"
                     f"{'5' * 100}\n")
    refset = RefSet.from_fasta(str(fa))
    idx = build_index(refset, 13, 2)
    _ = idx.addrs
    return refset, idx, str(fq), str(fq1), str(fq2)


def _run(refset, idx, reader, no_lane, fmt="sam"):
    if no_lane:
        os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
    try:
        rand.ranseed(1)
        eng = MapEngine(refset, idx, MapParams())
        assert not (eng.params.rmapflg & RMAPFLG_SEQBYSEQ)
        sink = io.StringIO()
        run_pipeline(eng, reader, sink, refset, fmt=fmt)
        return sink.getvalue()
    finally:
        os.environ.pop("SMALT_TPU_NO_FASTLANE", None)


def test_wholegenome_se_lane_byte_identical(contigs560):
    refset, idx, fq, _, _ = contigs560
    import smalt_tpu.map.fastlane as FL
    carried = {"n": 0}
    orig = FL.FastLane.render_block

    def rb(self, block):
        r = orig(self, block)
        if r is not None:
            carried["n"] += len(block)
        return r

    FL.FastLane.render_block = rb
    try:
        c_text = _run(refset, idx, FastqReader(fq), no_lane=False)
    finally:
        FL.FastLane.render_block = orig
    py_text = _run(refset, idx, FastqReader(fq), no_lane=True)
    assert c_text == py_text
    # the lane must carry the realistic-contig reads (the 8 chimeras
    # may drop their blocks to the oracle)
    assert carried["n"] >= 300, carried


def test_wholegenome_pe_lane_byte_identical(contigs560):
    refset, idx, _, fq1, fq2 = contigs560
    import smalt_tpu.map.fastlane as FL
    carried = {"n": 0}
    orig = FL.PairLane._call

    def call(self, A, B):
        r = orig(self, A, B)
        if r is not None:
            carried["n"] += r[1]
        return r

    FL.PairLane._call = call
    try:
        c_text = _run(refset, idx, PairedReader(fq1, fq2), no_lane=False)
    finally:
        FL.PairLane._call = orig
    py_text = _run(refset, idx, PairedReader(fq1, fq2), no_lane=True)
    assert c_text == py_text
    assert carried["n"] >= 280, carried


def test_wholegenome_cigar_lane_byte_identical(contigs560):
    refset, idx, fq, _, _ = contigs560
    c_text = _run(refset, idx, FastqReader(fq), no_lane=False, fmt="cigar")
    py_text = _run(refset, idx, FastqReader(fq), no_lane=True, fmt="cigar")
    assert c_text == py_text


def test_wholegenome_scorediff_byte_identical(contigs560):
    """-d 3 (multi-report walk, non-BEST) under the whole-genome
    regime."""
    from smalt_tpu.map.engine import RMAPFLG_BEST
    from smalt_tpu.results.pairs import (RESULTFLG_BEST, RESULTFLG_SINGLE,
                                         RESULTFLG_RANDSEL)
    refset, idx, fq, _, _ = contigs560

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            p = MapParams()
            # cli.py -d 3: scorediff nonzero clears BEST/SINGLE/RANDSEL
            p.rmapflg &= ~RMAPFLG_BEST
            p.rsltouflg &= ~(RESULTFLG_BEST | RESULTFLG_SINGLE |
                             RESULTFLG_RANDSEL)
            p.min_swatscor_below_max = 3
            eng = MapEngine(refset, idx, p)
            sink = io.StringIO()
            run_pipeline(eng, FastqReader(fq), sink, refset)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    assert run(False) == run(True)


def test_wholegenome_cplx_byte_identical(contigs560):
    """-w (complexity weighting) under the whole-genome regime."""
    from smalt_tpu.map.engine import RMAPFLG_CMPLXW
    refset, idx, fq, _, _ = contigs560

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            p = MapParams(use_cplx=True)
            p.rmapflg |= RMAPFLG_CMPLXW
            eng = MapEngine(refset, idx, p)
            sink = io.StringIO()
            run_pipeline(eng, FastqReader(fq), sink, refset)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    assert run(False) == run(True)


def test_wholegenome_split_mode_byte_identical(contigs560):
    """-p (split reads) under the whole-genome regime: the secondary
    complement-segment pass also collects in mode 0 and assigns
    sequence indices post-pass-2."""
    from smalt_tpu.map.engine import (RMAPFLG_SPLIT, RMAPFLG_NOSHRTINFO,
                                      RMAPFLG_SENSITIVE)
    from smalt_tpu.results.pairs import RESULTFLG_SPLIT
    refset, idx, fq, _, _ = contigs560

    def run(no_lane):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            p = MapParams()
            p.rmapflg |= (RMAPFLG_SPLIT | RMAPFLG_NOSHRTINFO |
                          RMAPFLG_SENSITIVE)
            p.rsltouflg |= RESULTFLG_SPLIT
            eng = MapEngine(refset, idx, p)
            sink = io.StringIO()
            run_pipeline(eng, FastqReader(fq), sink, refset)
            return sink.getvalue()
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)

    assert run(False) == run(True)
