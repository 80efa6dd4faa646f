"""Live differential against the reference binary: when a reference
SMALT build is present (SMALT_REF or /tmp/refbuild/src/smalt), map a
deterministic adversarial corpus with BOTH tools and byte-diff the SAM
bodies.  Unlike the checked-in goldens this exercises freshly generated
reads each run, and unlike the C-vs-Python fuzz it catches the case
where both our engines agree on something the reference does NOT do
(the bug class behind golden_shortmate_pe).  Skips cleanly when no
reference binary is available (CI without the upstream build)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REF = os.environ.get("SMALT_REF") or "/tmp/refbuild/src/smalt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="no reference binary")


def _body(text):
    return [l for l in text.splitlines() if l and not l.startswith("@")]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Genome with a planted repeat + reads spanning the length bands
    that matter: under the k-mer word, between word and engine
    threshold, under the output filter's default, and normal sizes —
    with errors, reverse strand, and no-quality records."""
    d = tmp_path_factory.mktemp("refdiff")
    rng = np.random.default_rng(20260818)
    bases = np.array(list(b"ACGT"), np.uint8)
    g = rng.choice(bases, 80_000)
    unit = rng.choice(bases, 300)
    for _ in range(6):
        cp = unit.copy()
        for j in rng.integers(0, len(cp), 3):
            cp[j] = bases[int(rng.integers(0, 4))]
        at = int(rng.integers(0, len(g) - len(cp)))
        g[at:at + len(cp)] = cp
    genome = g.tobytes().decode()
    fa = str(d / "g.fa")
    with open(fa, "w") as f:
        f.write(">rd1\n")
        for i in range(0, len(genome), 60):
            f.write(genome[i:i + 60] + "\n")
    comp = str.maketrans("ACGT", "TGCA")

    def mk_read(i):
        band = i % 5
        if band == 0:
            ln = int(rng.integers(2, 11))        # under the word
        elif band == 1:
            ln = int(rng.integers(11, 19))       # word..filter default
        elif band == 2:
            ln = int(rng.integers(19, 40))
        else:
            ln = int(rng.integers(40, 160))
        st = int(rng.integers(0, len(genome) - ln))
        s = list(genome[st:st + ln])
        for j in np.flatnonzero(rng.random(ln) < 0.03):
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        s = "".join(s)
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 41, ln))
        return s, q

    fq = str(d / "se.fq")
    with open(fq, "w") as f:
        for i in range(400):
            s, q = mk_read(i)
            f.write(f"@sr{i:04d}\n{s}\n+\n{q}\n")
    fq1, fq2 = str(d / "pe1.fq"), str(d / "pe2.fq")
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(200):
            a, qa = mk_read(i)
            b, qb = mk_read(i + 1)
            f1.write(f"@pr{i:04d}\n{a}\n+\n{qa}\n")
            f2.write(f"@pr{i:04d}\n{b}\n+\n{qb}\n")
    # index with BOTH tools at k11 s2 (short words expose the
    # threshold bands; our artifacts and the reference's don't mix)
    rp = str(d / "refidx")
    subprocess.run([REF, "index", "-k", "11", "-s", "2", rp, fa],
                   check=True, capture_output=True)
    op = str(d / "ouridx")
    r = subprocess.run([sys.executable, "-c",
                        "import sys; sys.path.insert(0, %r); "
                        "from smalt_tpu.cli import main; "
                        "sys.exit(main(['index', '-k', '11', '-s', '2', "
                        "%r, %r]))" % (REPO, op, fa)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return d, rp, op, fq, fq1, fq2


def _run_ref(args):
    r = subprocess.run([REF, "map"] + args, check=True,
                       capture_output=True, text=True)
    return _body(r.stdout)


def _run_ours(args, out):
    r = subprocess.run([sys.executable, "-c",
                        "import sys; sys.path.insert(0, %r); "
                        "from smalt_tpu.cli import main; "
                        "sys.exit(main(%r))" % (REPO, ["map"] + args +
                                                ["-o", out])],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with open(out) as f:
        return _body(f.read())


@pytest.mark.parametrize("extra", [
    [], ["-m", "0"], ["-d", "5"], ["-x"], ["-y", "0.5"], ["-w"],
    ["-q", "5"], ["-S", "match=2,subst=-3,gapopen=-5,gapext=-4"],
    ["-c", "0.8", "-x"], ["-a"],
])
def test_ref_differential_se(corpus, tmp_path, extra):
    d, rp, op, fq, _, _ = corpus
    base = ["-f", "sam", "-r", "1"] + extra
    want = _run_ref(base + [rp, fq])
    got = _run_ours(base + [op, fq], str(tmp_path / "se.sam"))
    assert got == want


@pytest.mark.parametrize("extra", [
    [], ["-x"], ["-d", "0"], ["-j", "100", "-i", "300"], ["-w"],
    ["-p", "-l", "mp"], ["-p", "-x"], ["-x", "-d", "0"],
    ["-p", "-d", "0"], ["-a"], ["-a", "-p"],
])
def test_ref_differential_pe(corpus, tmp_path, extra):
    d, rp, op, _, fq1, fq2 = corpus
    base = ["-f", "sam", "-r", "1"] + extra
    want = _run_ref(base + [rp, fq1, fq2])
    got = _run_ours(base + [op, fq1, fq2], str(tmp_path / "pe.sam"))
    assert got == want


@pytest.mark.parametrize("fmt", ["cigar", "ssaha"])
def test_ref_differential_pe_split_formats(corpus, tmp_path, fmt):
    d, rp, op, _, fq1, fq2 = corpus
    base = ["-f", fmt, "-r", "1", "-p"]
    want = _run_ref(base + [rp, fq1, fq2])
    got = _run_ours(base + [op, fq1, fq2], str(tmp_path / "pf.out"))
    assert got == want


@pytest.mark.parametrize("fmt", ["cigar", "ssaha"])
def test_ref_differential_se_formats(corpus, tmp_path, fmt):
    d, rp, op, fq, _, _ = corpus
    base = ["-f", fmt, "-r", "1"]
    want = _run_ref(base + [rp, fq])
    got = _run_ours(base + [op, fq], str(tmp_path / "se.out"))
    assert got == want


def test_ref_differential_se_split(corpus, tmp_path):
    d, rp, op, fq, _, _ = corpus
    base = ["-f", "sam", "-r", "1", "-p"]
    want = _run_ref(base + [rp, fq])
    got = _run_ours(base + [op, fq], str(tmp_path / "sp.sam"))
    assert got == want


def test_ref_differential_pe_split(corpus, tmp_path):
    d, rp, op, _, fq1, fq2 = corpus
    base = ["-f", "sam", "-r", "1", "-p"]
    want = _run_ref(base + [rp, fq1, fq2])
    got = _run_ours(base + [op, fq1, fq2], str(tmp_path / "psp.sam"))
    assert got == want


@pytest.mark.parametrize("ptyp", ["mp", "pp"])
def test_ref_differential_pe_pairtypes(corpus, tmp_path, ptyp):
    d, rp, op, _, fq1, fq2 = corpus
    base = ["-f", "sam", "-r", "1", "-l", ptyp]
    want = _run_ref(base + [rp, fq1, fq2])
    got = _run_ours(base + [op, fq1, fq2], str(tmp_path / "pt.sam"))
    assert got == want


def test_ref_differential_longreads(corpus, tmp_path):
    """Kilobase noisy reads (substitutions + indels) through the exact
    engine vs the reference — exercises the wide-band recursive path."""
    d, rp, op, _, _, _ = corpus
    rng = np.random.default_rng(777)
    fa_lines = open(str(d / "g.fa")).read().splitlines()
    genome = "".join(l for l in fa_lines if not l.startswith(">"))
    fq = str(tmp_path / "long.fq")
    with open(fq, "w") as f:
        for i in range(8):
            ln = int(rng.integers(800, 2000))
            st = int(rng.integers(0, len(genome) - ln - 10))
            out = []
            for ch in genome[st:st + ln]:
                r = rng.random()
                if r < 0.02:
                    continue                     # deletion
                if r < 0.04:
                    out.append("ACGT"[int(rng.integers(0, 4))])  # ins
                if rng.random() < 0.05:
                    ch = "ACGT"[int(rng.integers(0, 4))]         # subst
                out.append(ch)
            s = "".join(out)
            f.write(f"@lr{i}\n{s}\n+\n{'I' * len(s)}\n")
    base = ["-f", "sam", "-r", "1"]
    want = _run_ref(base + [rp, fq])
    got = _run_ours(base + [op, fq], str(tmp_path / "lr.sam"))
    assert got == want
