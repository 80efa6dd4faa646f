"""Differential test: the native pair path (fl_single_rs/fl_hit_count
feeding the Python pair layer) must be byte-identical to the pure
Python oracle — including on a repeat-rich genome where the rescue and
remap branches (which fall back to the oracle mid-pair) trigger."""
import io
import os

import numpy as np
import pytest

from smalt_tpu import cli


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(83)
    bases = "ACGT"

    def rand_seq(n):
        return "".join(bases[i] for i in rng.integers(0, 4, n))

    unit = rand_seq(500)
    parts = []
    pos = 0
    copy_starts = []
    for c in range(6):
        sp = rand_seq(3000)
        parts.append(sp)
        pos += len(sp)
        cp = list(unit)
        for j in rng.integers(0, len(unit), 5):
            cp[j] = bases[(bases.index(cp[j]) + 1) % 4]
        parts.append("".join(cp))
        copy_starts.append(pos)
        pos += len(unit)
    parts.append(rand_seq(3000))
    genome = "".join(parts)
    d = tmp_path_factory.mktemp("pairnat")
    fa = os.path.join(d, "g.fa")
    with open(fa, "w") as f:
        f.write(">g\n" + genome + "\n")
    assert cli.cmd_index(["-k", "11", "-s", "2",
                          os.path.join(d, "idx"), fa]) == 0

    comp = str.maketrans("ACGT", "TGCA")
    RL, INS = 100, 320
    r1, r2 = [], []
    for i in range(220):
        if i % 4 == 3:
            # fragment anchored in/near a repeat copy: exercises the
            # remap/rescue (oracle-fallback) branches
            cs = copy_starts[i % 6]
            st = cs + int(rng.integers(0, len(unit) - 50)) - INS // 2
            st = max(0, min(st, len(genome) - INS))
        else:
            st = int(rng.integers(0, len(genome) - INS))
        frag = genome[st : st + INS]
        a = list(frag[:RL])
        b = list(frag[-RL:])
        for arr in (a, b):
            for j in np.flatnonzero(rng.random(RL) < 0.02):
                arr[j] = bases[int(rng.integers(0, 4))]
        if i % 7 == 0:
            # heavily corrupted mate: unmapped/rescue territory
            for j in range(0, RL, 5):
                b[j] = bases[(bases.index(b[j]) + 1) % 4]
        r1.append(f"@d{i}\n{''.join(a)}\n+\n{'I' * RL}\n")
        r2.append(f"@d{i}\n{''.join(b).translate(comp)[::-1]}\n+\n"
                  f"{'I' * RL}\n")
    fq1 = os.path.join(d, "r1.fq")
    fq2 = os.path.join(d, "r2.fq")
    open(fq1, "w").write("".join(r1))
    open(fq2, "w").write("".join(r2))
    return os.path.join(d, "idx"), fq1, fq2, str(d)


def _body(path):
    return [l for l in open(path) if not l.startswith("@")]


def test_pair_native_matches_oracle(world, tmp_path, monkeypatch):
    idx, fq1, fq2, d = world
    nat = os.path.join(tmp_path, "nat.sam")
    py = os.path.join(tmp_path, "py.sam")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", nat,
                        idx, fq1, fq2]) == 0
    monkeypatch.setenv("SMALT_TPU_NO_PAIRNATIVE", "1")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", py,
                        idx, fq1, fq2]) == 0
    a, b = _body(nat), _body(py)
    assert len(a) == len(b) == 440
    for la, lb in zip(a, b):
        assert la == lb, f"\nnative: {la}\noracle: {lb}"


@pytest.mark.parametrize("opts", [["-l", "mp"], ["-i", "600", "-j", "50"],
                                  ["-x"]])
def test_pair_native_option_variants(world, tmp_path, monkeypatch, opts):
    idx, fq1, fq2, d = world
    nat = os.path.join(tmp_path, "n.sam")
    py = os.path.join(tmp_path, "p.sam")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", nat] + opts +
                       [idx, fq1, fq2]) == 0
    monkeypatch.setenv("SMALT_TPU_NO_PAIRNATIVE", "1")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", py] + opts +
                       [idx, fq1, fq2]) == 0
    assert _body(nat) == _body(py)


@pytest.mark.parametrize("seed", [11, 29, 71])
def test_pair_native_fuzz_minigenomes(tmp_path, monkeypatch, seed):
    """Fuzz: random mini-genomes (mixed contigs, short reads, skewed
    inserts, N bases) — native pair path must stay byte-identical to
    the oracle on every seed."""
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    contigs = ["".join(bases[i] for i in rng.integers(0, 4, int(n)))
               for n in rng.integers(2000, 6000, 3)]
    d = str(tmp_path)
    fa = os.path.join(d, "g.fa")
    with open(fa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">z{i}\n{c}\n")
    assert cli.cmd_index(["-k", "11", "-s", "2",
                          os.path.join(d, "idx"), fa]) == 0
    comp = str.maketrans("ACGT", "TGCA")
    r1, r2 = [], []
    for i in range(80):
        ci = int(rng.integers(0, 3))
        g = contigs[ci]
        RL = int(rng.integers(40, 120))
        ins = int(rng.integers(2 * RL, min(len(g), 4 * RL)))
        st = int(rng.integers(0, len(g) - ins))
        frag = g[st : st + ins]
        a = list(frag[:RL])
        b = list(frag[-RL:])
        for arr in (a, b):
            for j in np.flatnonzero(rng.random(RL) < 0.04):
                arr[j] = "ACGTN"[int(rng.integers(0, 5))]
        r1.append(f"@f{i}\n{''.join(a)}\n+\n{'I' * RL}\n")
        r2.append(f"@f{i}\n{''.join(b).translate(comp)[::-1]}\n+\n"
                  f"{'I' * RL}\n")
    fq1 = os.path.join(d, "r1.fq")
    fq2 = os.path.join(d, "r2.fq")
    open(fq1, "w").write("".join(r1))
    open(fq2, "w").write("".join(r2))
    nat = os.path.join(d, "n.sam")
    py = os.path.join(d, "p.sam")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", nat,
                        os.path.join(d, "idx"), fq1, fq2]) == 0
    monkeypatch.setenv("SMALT_TPU_NO_PAIRNATIVE", "1")
    assert cli.cmd_map(["-f", "sam", "-r", "1", "-o", py,
                        os.path.join(d, "idx"), fq1, fq2]) == 0
    assert _body(nat) == _body(py), f"seed {seed} diverged"
