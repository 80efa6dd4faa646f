"""Randomized differential: adversarial reads through the C fast lanes
vs the pure-Python engine, byte-for-byte.

Edge cases the goldens don't reach: IUPAC ambiguity codes, lowercase
bases, N-runs, 1-5 bp reads (ShortSeq), reads longer than any golden,
missing quality strings, and boundary quality values — over both the
Read-object block path and the raw-bytes bulk paths."""
import io
import os

import numpy as np
import pytest

from smalt_tpu import rand
from smalt_tpu.results import pairs as pairs_mod
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams
from smalt_tpu.map.pipeline import (run_pipeline, run_pipeline_raw_fastq,
                                    run_pipeline_raw_pairs)
from smalt_tpu.seq import codec
from smalt_tpu.seq.io import PairedReader, FastqReader, Read
from smalt_tpu.seq.refset import RefSet

IUPAC = "RYSWKMBDHVN"

# extended fuzzing: SMALT_FUZZ_SEEDS=N loops the differentials over N
# independent read-set seeds (default 1 keeps the CI cost unchanged)
_N_SEEDS = int(os.environ.get("SMALT_FUZZ_SEEDS", "1"))


@pytest.fixture(scope="module")
def fuzz_ref(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(99)
    bases = np.array(list(b"ACGT"), np.uint8)
    g = rng.choice(bases, 60_000)
    unit = rng.choice(bases, 400)
    for _ in range(8):        # repeats: multi-best + drand48 selection
        cp = unit.copy()
        for j in rng.integers(0, len(cp), 4):
            cp[j] = bases[int(rng.integers(0, 4))]
        at = int(rng.integers(0, len(g) - len(cp)))
        g[at:at + len(cp)] = cp
    genome = g.tobytes().decode()
    fa = d / "g.fa"
    fa.write_text(">c1\n" + "\n".join(
        genome[i:i + 60] for i in range(0, len(genome), 60)) + "\n")
    refset = RefSet.from_fasta(str(fa))
    idx = build_index(refset, 11, 2)
    _ = idx.addrs
    return refset, idx, genome, str(d)


def _mutate(rng, s: str) -> str:
    out = list(s)
    n = len(out)
    for j in np.flatnonzero(rng.random(n) < 0.02):
        out[j] = "ACGT"[int(rng.integers(0, 4))]
    for j in np.flatnonzero(rng.random(n) < 0.01):
        out[j] = IUPAC[int(rng.integers(0, len(IUPAC)))]
    if rng.random() < 0.2:                       # lowercase stretch
        a = int(rng.integers(0, n))
        b = min(n, a + int(rng.integers(1, 30)))
        out[a:b] = [c.lower() for c in out[a:b]]
    if rng.random() < 0.15:                      # N-run
        a = int(rng.integers(0, n))
        b = min(n, a + int(rng.integers(1, 12)))
        out[a:b] = ["N"] * (b - a)
    return "".join(out)


def _fuzz_reads(rng, genome, n):
    reads = []
    for i in range(n):
        kind = int(rng.integers(0, 10))
        if kind == 0:                            # ShortSeq territory
            ln = int(rng.integers(1, 6))
        elif kind == 1:
            ln = int(rng.integers(6, 25))
        elif kind == 2:
            ln = int(rng.integers(200, 400))
        else:
            ln = int(rng.integers(40, 160))
        st = int(rng.integers(0, len(genome) - ln))
        s = genome[st:st + ln]
        if kind == 3:
            s = "N" * ln                         # unmappable
        else:
            s = _mutate(rng, s)
        if rng.random() < 0.5:                   # reverse strand
            s = s.translate(str.maketrans("ACGTacgt", "TGCAtgca"))[::-1]
        if rng.random() < 0.2:
            qual = None                          # FASTA-style record
        else:
            q = rng.integers(0, 42, ln) + 33     # '!'..'J'
            qual = bytes(int(x) for x in q)
        reads.append(Read(name=f"fz{i:04d}/1", seq=codec.encode(s.encode()),
                          qual=qual))
        reads[-1].raw = s                        # keep letters for FASTQ
    return reads


def _diff_run(engine_factory, reads_iter_factory, refset, fmt="sam",
              **kw):
    outs = []
    for no_lane in (False, True):
        if no_lane:
            os.environ["SMALT_TPU_NO_FASTLANE"] = "1"
        try:
            rand.ranseed(1)
            eng = engine_factory()
            sink = io.StringIO()
            run_pipeline(eng, reads_iter_factory(), sink, refset,
                         fmt=fmt, **kw)
            outs.append(sink.getvalue())
        finally:
            os.environ.pop("SMALT_TPU_NO_FASTLANE", None)
    return outs


@pytest.mark.parametrize("sbase",
                         [4242 + 1000 * k for k in range(_N_SEEDS)])
@pytest.mark.parametrize("fmt", ["sam", "cigar"])
def test_fuzz_single_end(fuzz_ref, fmt, sbase):
    import smalt_tpu.map.fastlane as FL
    refset, idx, genome, _ = fuzz_ref
    rng = np.random.default_rng(sbase)
    reads = _fuzz_reads(rng, genome, 300)
    rendered = {"n": 0}
    orig = FL.FastLane.render_block

    def rb(self, block):
        t = orig(self, block)
        if t is not None:
            rendered["n"] += len(block)
        return t

    FL.FastLane.render_block = rb
    try:
        c_text, py_text = _diff_run(
            lambda: MapEngine(refset, idx, MapParams()),
            lambda: iter(reads), refset, fmt=fmt)
    finally:
        FL.FastLane.render_block = orig
    assert c_text == py_text
    assert rendered["n"] >= 290          # the C lane carried the fuzz


def test_fuzz_single_end_minbasq(fuzz_ref):
    """-q 5: low-quality k-mers skipped at seed time."""
    refset, idx, genome, _ = fuzz_ref
    rng = np.random.default_rng(777)
    reads = _fuzz_reads(rng, genome, 200)
    c_text, py_text = _diff_run(
        lambda: MapEngine(refset, idx, MapParams(min_basq=5)),
        lambda: iter(reads), refset)
    assert c_text == py_text


@pytest.mark.parametrize("sbase",
                         [31337 + 1000 * k for k in range(_N_SEEDS)])
def test_fuzz_paired(fuzz_ref, sbase):
    import smalt_tpu.map.fastlane as FL
    refset, idx, genome, _ = fuzz_ref
    rng = np.random.default_rng(sbase)
    a = _fuzz_reads(rng, genome, 200)
    b = _fuzz_reads(rng, genome, 200)
    pairs = list(zip(a, b))
    done = {"n": 0}
    orig = FL.PairLane._call

    def call(self, A, B):
        r = orig(self, A, B)
        if r is not None:
            done["n"] += r[1]
        return r

    FL.PairLane._call = call
    try:
        c_text, py_text = _diff_run(
            lambda: MapEngine(refset, idx, MapParams()),
            lambda: iter(pairs), refset)
    finally:
        FL.PairLane._call = orig
    assert c_text == py_text
    assert done["n"] >= 150              # the C pair lane carried the fuzz


def test_fuzz_paired_split(fuzz_ref):
    """Paired -p (split-read) through the C pair lane: the full
    hit-info probe, the mapSecondary passes on both mates, and the
    per-segment PARTIAL report chain, vs the Python oracle."""
    from smalt_tpu.map.engine import (RMAPFLG_BEST, RMAPFLG_SPLIT,
                                      RMAPFLG_NOSHRTINFO,
                                      RMAPFLG_SENSITIVE)
    import smalt_tpu.map.fastlane as FL
    refset, idx, genome, _ = fuzz_ref
    rng = np.random.default_rng(97531)
    a = _fuzz_reads(rng, genome, 150)
    b = _fuzz_reads(rng, genome, 150)
    pairs = list(zip(a, b))
    done = {"n": 0}
    orig = FL.PairLane._call

    def call(self, A, B):
        r = orig(self, A, B)
        if r is not None:
            done["n"] += r[1]
        return r

    FL.PairLane._call = call
    params = MapParams(
        rmapflg=(RMAPFLG_BEST | RMAPFLG_SPLIT | RMAPFLG_NOSHRTINFO |
                 RMAPFLG_SENSITIVE),
        rsltouflg=(pairs_mod.RESULTFLG_BEST | pairs_mod.RESULTFLG_SINGLE |
                   pairs_mod.RESULTFLG_RANDSEL | pairs_mod.RESULTFLG_SPLIT))
    try:
        c_text, py_text = _diff_run(
            lambda: MapEngine(refset, idx, params),
            lambda: iter(pairs), refset)
    finally:
        FL.PairLane._call = orig
    assert c_text == py_text
    assert done["n"] >= 110              # the C pair lane carried the fuzz


def test_fuzz_raw_fastq(fuzz_ref):
    """The raw-bytes SE bulk path (C parsing + in-C encode/name-cut) on
    the same adversarial reads, vs the regular Read-object pipeline."""
    refset, idx, genome, d = fuzz_ref
    rng = np.random.default_rng(2024)
    reads = _fuzz_reads(rng, genome, 300)
    fq = os.path.join(d, "fz.fq")
    with open(fq, "w") as f:
        for r in reads:
            q = r.qual if r.qual is not None else b"5" * len(r.raw)
            f.write(f"@{r.name} extra comment\n{r.raw}\n+\n"
                    f"{q.decode('latin1')}\n")
    rand.ranseed(1)
    sink_raw = io.StringIO()
    ok = run_pipeline_raw_fastq(MapEngine(refset, idx, MapParams()), fq,
                                sink_raw, refset)
    assert ok
    rand.ranseed(1)
    sink_reg = io.StringIO()
    run_pipeline(MapEngine(refset, idx, MapParams()), FastqReader(fq),
                 sink_reg, refset)
    assert sink_raw.getvalue() == sink_reg.getvalue()


def test_fuzz_raw_pairs(fuzz_ref):
    """The raw-bytes PE bulk path on adversarial pairs."""
    refset, idx, genome, d = fuzz_ref
    rng = np.random.default_rng(555)
    a = _fuzz_reads(rng, genome, 200)
    b = _fuzz_reads(rng, genome, 200)
    fq1 = os.path.join(d, "fzp1.fq")
    fq2 = os.path.join(d, "fzp2.fq")
    for path, rd in ((fq1, a), (fq2, b)):
        with open(path, "w") as f:
            for r in rd:
                q = r.qual if r.qual is not None else b"5" * len(r.raw)
                f.write(f"@{r.name}\n{r.raw}\n+\n{q.decode('latin1')}\n")
    rand.ranseed(1)
    sink_raw = io.StringIO()
    ok = run_pipeline_raw_pairs(MapEngine(refset, idx, MapParams()),
                                fq1, fq2, sink_raw, refset)
    assert ok
    rand.ranseed(1)
    sink_reg = io.StringIO()
    run_pipeline(MapEngine(refset, idx, MapParams()),
                 PairedReader(fq1, fq2), sink_reg, refset)
    assert sink_raw.getvalue() == sink_reg.getvalue()
