"""Parity soak: generate fresh adversarial corpora (new seed each
round) and byte-diff our SAM/cigar/ssaha output against the live
reference binary across an option matrix.  This is the bug-hunting
harness behind tests/test_ref_differential.py — the checked-in test
pins one seed; the soak walks seeds indefinitely.

Usage: python tools/parity_soak.py [n_rounds] [start_seed]
Writes one line per (seed, config); any DIFF line is a parity bug.
Requires the reference build (SMALT_REF or /tmp/refbuild/src/smalt).
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REF = os.environ.get("SMALT_REF") or "/tmp/refbuild/src/smalt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SE_MATRIX = [
    [], ["-m", "0"], ["-d", "5"], ["-x"], ["-y", "0.5"], ["-w"],
    ["-q", "5"], ["-p"], ["-a"], ["-f", "cigar"], ["-f", "ssaha"],
    ["-S", "match=2,subst=-3,gapopen=-5,gapext=-4"],
]
PE_MATRIX = [
    [], ["-x"], ["-d", "0"], ["-j", "100", "-i", "300"], ["-w"],
    ["-p"], ["-l", "mp"], ["-l", "pp"], ["-p", "-x"], ["-a"],
    ["-p", "-f", "cigar"], ["-f", "ssaha"],
]


def _body(text):
    return [l for l in text.splitlines() if l and not l.startswith("@")]


def gen_corpus(d, seed):
    rng = np.random.default_rng(seed)
    bases = np.array(list(b"ACGT"), np.uint8)
    glen = int(rng.integers(40_000, 120_000))
    g = rng.choice(bases, glen)
    unit = rng.choice(bases, int(rng.integers(120, 500)))
    for _ in range(int(rng.integers(3, 9))):
        cp = unit.copy()
        for j in rng.integers(0, len(cp), 3):
            cp[j] = bases[int(rng.integers(0, 4))]
        at = int(rng.integers(0, len(g) - len(cp)))
        g[at:at + len(cp)] = cp
    genome = g.tobytes().decode()
    fa = os.path.join(d, "g.fa")
    with open(fa, "w") as f:
        f.write(">rd1\n")
        for i in range(0, len(genome), 60):
            f.write(genome[i:i + 60] + "\n")
    comp = str.maketrans("ACGT", "TGCA")

    def mk_read(i):
        band = i % 6
        if band == 0:
            ln = int(rng.integers(2, 11))
        elif band == 1:
            ln = int(rng.integers(11, 19))
        elif band == 2:
            ln = int(rng.integers(19, 40))
        elif band == 3:
            ln = int(rng.integers(160, 400))
        else:
            ln = int(rng.integers(40, 160))
        st = int(rng.integers(0, len(genome) - ln))
        s = list(genome[st:st + ln])
        for j in np.flatnonzero(rng.random(ln) < 0.04):
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        if rng.random() < 0.1:          # chimera: splice a far segment
            cut = ln // 2
            st2 = int(rng.integers(0, len(genome) - cut - 1))
            s[cut:] = list(genome[st2:st2 + ln - cut])
        s = "".join(s)
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 41, ln))
        return s, q

    fq = os.path.join(d, "se.fq")
    with open(fq, "w") as f:
        for i in range(300):
            s, q = mk_read(i)
            f.write(f"@sr{i:04d}\n{s}\n+\n{q}\n")
    fq1, fq2 = os.path.join(d, "pe1.fq"), os.path.join(d, "pe2.fq")
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(150):
            a, qa = mk_read(i)
            b, qb = mk_read(i + 1)
            f1.write(f"@pr{i:04d}\n{a}\n+\n{qa}\n")
            f2.write(f"@pr{i:04d}\n{b}\n+\n{qb}\n")
    k = int(rng.integers(11, 14))
    s_ = int(rng.integers(1, 5))
    rp = os.path.join(d, "refidx")
    subprocess.run([REF, "index", "-k", str(k), "-s", str(s_), rp, fa],
                   check=True, capture_output=True)
    op = os.path.join(d, "ouridx")
    r = subprocess.run([sys.executable, "-c",
                        "import sys; sys.path.insert(0, %r); "
                        "from smalt_tpu.cli import main; "
                        "sys.exit(main(['index', '-k', '%d', '-s', '%d', "
                        "%r, %r]))" % (REPO, k, s_, op, fa)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return rp, op, fq, fq1, fq2, (k, s_)


def run_one(d, rp, op, args, inputs, tag):
    r = subprocess.run([REF, "map", "-r", "1"] + args + [rp] + inputs,
                       capture_output=True, text=True)
    if r.returncode != 0:
        return "REF-FAIL"
    want = _body(r.stdout)
    out = os.path.join(d, "o.out")
    r2 = subprocess.run([sys.executable, "-c",
                         "import sys; sys.path.insert(0, %r); "
                         "from smalt_tpu.cli import main; "
                         "sys.exit(main(%r))" %
                         (REPO, ["map", "-r", "1"] + args + [op] +
                          inputs + ["-o", out])],
                        capture_output=True, text=True)
    if r2.returncode != 0:
        return "OURS-FAIL: " + r2.stderr[-200:]
    with open(out) as f:
        got = _body(f.read())
    if got != want:
        nd = sum(1 for a, b in zip(want, got) if a != b) + \
            abs(len(want) - len(got))
        return f"DIFF {nd}"
    return "ok"


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    bad = 0
    for rnd in range(n_rounds):
        seed = seed0 + rnd
        with tempfile.TemporaryDirectory() as d:
            rp, op, fq, fq1, fq2, ks = gen_corpus(d, seed)
            for args in SE_MATRIX:
                st = run_one(d, rp, op, args, [fq], "se")
                line = f"seed={seed} k{ks[0]}s{ks[1]} se {' '.join(args) or '-'}: {st}"
                if st != "ok":
                    bad += 1
                    print("!!", line, flush=True)
                else:
                    print("  ", line, flush=True)
            for args in PE_MATRIX:
                st = run_one(d, rp, op, args, [fq1, fq2], "pe")
                line = f"seed={seed} k{ks[0]}s{ks[1]} pe {' '.join(args) or '-'}: {st}"
                if st != "ok":
                    bad += 1
                    print("!!", line, flush=True)
                else:
                    print("  ", line, flush=True)
    print(f"SOAK DONE rounds={n_rounds} bad={bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
