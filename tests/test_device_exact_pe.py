"""Device-exact PAIRED-END differentials (VERDICT r4 #2): both mates'
front halves run through the device collate block, the C pair lane
consumes the state for its unrestricted mapping calls
(fl_pair_map_single_dev), and output must be byte-identical to the
host pair lane — including pairs that exercise the remap branch, the
fine re-hash, per-mate restages and the Python-oracle protocol.
Runs on the CPU backend (conftest forces it)."""
import io
import os

import numpy as np
import pytest

from smalt_tpu.seq.refset import RefSet
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams
from smalt_tpu.map.pipeline import run_pipeline_raw_pairs
from smalt_tpu.native import get_lib
from smalt_tpu import rand

QLEN = 100


def _pe_world(tmp_path, seed=41, nctg=2, L=30000, npairs=300,
              k=11, nskip=2):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    comp = str.maketrans("ACGT", "TGCA")
    unit = "".join(rng.choice(list(bases), 400))
    seqs = []
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        for s in range(nctg):
            g = "".join(rng.choice(list(bases), L))
            for _ in range(12):          # repeats: remap/rescue paths
                at = int(rng.integers(0, L - 400))
                g = g[:at] + unit + g[at + 400:]
            seqs.append(g)
            f.write(f">s{s}\n{g}\n")
    fq1 = tmp_path / "r1.fq"
    fq2 = tmp_path / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(npairs):
            s = int(rng.integers(0, nctg))
            g = seqs[s]
            kind = i % 10
            if kind < 7:                 # proper pairs, sane insert
                ins = int(rng.integers(220, 420))
                st = int(rng.integers(0, len(g) - ins))
                a = g[st:st + QLEN]
                b = g[st + ins - QLEN:st + ins].translate(comp)[::-1]
            elif kind == 7:              # discordant: mates far apart
                sa = int(rng.integers(0, len(g) - QLEN))
                sb = int(rng.integers(0, len(g) - QLEN))
                a = g[sa:sa + QLEN]
                b = g[sb:sb + QLEN].translate(comp)[::-1]
            elif kind == 8:              # repeat-unit pair: ambiguity
                a = unit[:QLEN]
                b = unit[-QLEN:].translate(comp)[::-1]
            else:                        # one mate junk: rescue path
                st = int(rng.integers(0, len(g) - QLEN))
                a = g[st:st + QLEN]
                b = "".join(rng.choice(list(bases), QLEN))
            if kind < 9:                 # mutations: real DP everywhere
                a = list(a)
                b = list(b)
                for _ in range(3):
                    a[int(rng.integers(0, QLEN))] = \
                        bases[int(rng.integers(0, 4))]
                    b[int(rng.integers(0, QLEN))] = \
                        bases[int(rng.integers(0, 4))]
                a = "".join(a)
                b = "".join(b)
            f1.write(f"@p{i}\n{a}\n+\n{'5' * QLEN}\n")
            f2.write(f"@p{i}\n{b}\n+\n{'5' * QLEN}\n")
    refset = RefSet.from_fasta(str(fa))
    idx = build_index(refset, k, nskip)
    _ = idx.addrs
    return refset, idx, str(fq1), str(fq2)


@pytest.mark.parametrize("seed,nctg,k", [(41, 2, 11), (42, 6, 13)])
def test_pe_device_exact_byte_identical(tmp_path, monkeypatch, seed,
                                        nctg, k):
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib required")
    monkeypatch.setenv("SMALT_DX_BATCH", "128")
    refset, idx, fq1, fq2 = _pe_world(tmp_path, seed=seed, nctg=nctg,
                                      k=k)

    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    host = io.StringIO()
    assert run_pipeline_raw_pairs(eng, fq1, fq2, host, refset)

    rand.ranseed(1)
    eng2 = MapEngine(refset, idx, MapParams())
    dx_out = io.StringIO()
    assert run_pipeline_raw_pairs(eng2, fq1, fq2, dx_out, refset,
                                  device_exact=True)
    assert dx_out.getvalue() == host.getvalue()


def test_pe_device_exact_serves_pairs(tmp_path, monkeypatch):
    """The identity must come from the device path: most pairs map
    through the device state (low restage), and the insert histogram
    (-g sampling RNG) still matches the host lane."""
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib required")
    monkeypatch.setenv("SMALT_DX_BATCH", "128")
    refset, idx, fq1, fq2 = _pe_world(tmp_path, seed=43)
    from smalt_tpu.map.fastlane import DeviceExact, PairLane
    from smalt_tpu.map import pipeline as pl
    from smalt_tpu.seq import codec
    from smalt_tpu.seq.io import Read

    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    host = io.StringIO()
    assert run_pipeline_raw_pairs(eng, fq1, fq2, host, refset)

    rand.ranseed(1)
    eng2 = MapEngine(refset, idx, MapParams())
    plane = PairLane.make(eng2, "sam", True, False, False, False, None)
    dx = DeviceExact.make(eng2, "sam", True, False, False, False)
    assert plane is not None and dx is not None
    pl._init_worker(eng2, ("sam", True, False, refset, False), 1)
    pl._g["ihist"] = None
    pl._g["fix_primary"] = False
    pl._g["reseed_per_block"] = False

    def mk_pair(i, nA, sA, qA, nB, sB, qB):
        return (Read(name=nA[i].decode(), seq=codec.encode(sA[i]),
                     qual=qA[i]),
                Read(name=nB[i].decode(), seq=codec.encode(sB[i]),
                     qual=qB[i]))

    sink = io.StringIO()
    dx.run_raw_pairs(plane, fq1, fq2, sink, pl._oracle_one_pair,
                     mk_pair)
    assert sink.getvalue() == host.getvalue()
    # 300 pairs = 600 mates on a deliberately repeat-saturated corpus
    # (~16% repeat bases -> H-cap overflows): the majority must still
    # map through the device state, not blanket restage
    assert dx.n_restaged <= 250, dx.n_restaged
