"""Memory-safety net for the native core: build the shared object with
AddressSanitizer and push SE, PE and long-indel reads through the full
engine in a subprocess (LD_PRELOAD'd ASan runtime).  Skips when the
toolchain lacks ASan.  The reference relies on checked-malloc macros
(elib.h) for the same class of bugs; this is the sanitizer-backed
equivalent (SURVEY §5 race/sanitizer row).
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import os, sys
sys.path.insert(0, %(root)r)
import smalt_tpu.native as native
import ctypes
lib = ctypes.CDLL(%(so)r)
native._declare(lib)
native._declare_fastlane(lib)
native._lib = lib
native._loaded = True
native.nrsort = native._NrSortModule(lib)
import smalt_tpu.sort_nr as sn
sn._nrsort_ext = native.nrsort

import gzip
import numpy as np
from smalt_tpu.seq.refset import RefSet
from smalt_tpu.seq.io import Read
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams
from smalt_tpu.seq import codec

refset = RefSet.from_fasta(os.path.join(%(root)r, 'tests/data/genome.fa'))
idx = build_index(refset, 13, 4)
eng = MapEngine(refset, idx, MapParams())
with gzip.open(os.path.join(%(root)r, 'tests/data/reads_se.fq.gz'),
               'rt') as f:
    lines = f.read().splitlines()
reads = []
for i in range(0, 2000, 4):
    reads.append(Read(name=lines[i][1:],
                      seq=codec.encode(lines[i + 1].encode()),
                      qual=lines[i + 3].encode()))
for r in reads:
    eng.rmap_single(r)
for a, b in list(zip(reads[::2], reads[1::2]))[:60]:
    eng.rmap_pair(a, b)
rng = np.random.default_rng(42)
g = refset.codes
for i in range(8):
    st = int(rng.integers(0, refset.total_len - 3000))
    seg = codec.decode(g[st : st + 2000]).decode()
    out = []
    for ch in seg:
        r = rng.random()
        if r < 0.01:
            continue
        if r < 0.02:
            out.append('ACGT'[int(rng.integers(0, 4))])
        if rng.random() < 0.05:
            ch = 'ACGT'[int(rng.integers(0, 4))]
        out.append(ch)
    s = ''.join(out)
    eng.rmap_single(Read(name=f'L{i}', seq=codec.encode(s.encode()),
                         qual=b'I' * len(s)))
# fast-mode tail (mc_fast_align) on narrow and full bands, both strands
from smalt_tpu.map.fastmode import FastTail
ft = FastTail(refset)
for i in range(60):
    st = int(rng.integers(0, refset.total_len - 300))
    win = refset.codes[st : st + 160]
    q = refset.codes[st + 14 : st + 14 + 100]
    for rev in (False, True):
        qc = codec.revcomp_codes(q) if rev else q
        ft._traceback(qc, rev, win, -40, 40)
        ft._traceback(qc, rev, win, -(len(win) - 1), len(qc) - 1)

# C fast-lane block (fl_map_block): whole-block exact SE mapping,
# all three text emitters (sam / cigar / ssaha)
from smalt_tpu.map.fastlane import FastLane
names = [r.sam_name.encode() for r in reads[:64]]
seqs = [codec.decode(r.seq) for r in reads[:64]]
qls = [r.qual for r in reads[:64]]
for _fmt in ('sam', 'cigar', 'ssaha'):
    lane = FastLane.make(eng, _fmt, True, False, False, False)
    assert lane is not None
    text = lane.render_raw_block(names, seqs, qls)
    assert text is not None

# C batched fast tails (fl_fast_tail_block / fl_fast_tail_pairs) with
# synthetic device outputs (no jax needed under ASan)
import numpy as _np
n = 32
sc = _np.full(n, 80, _np.int32); sc[5] = 0
sc2 = _np.full(n, 40, _np.int32)
stv = _np.asarray([int(rng.integers(0, refset.total_len - 200))
                   for _ in range(n)], _np.int32)
sd = _np.asarray([i %% 2 for i in range(n)], _np.int32)
hu = _np.full(n, 16, _np.int32); ht = _np.full(n, 20, _np.int32)
n2 = _np.full(n, 1, _np.int32); am = _np.zeros(n, _np.int32)
outs = {'score': sc, 'score2': sc2, 'start': stv, 'strand': sd,
        'hits_used': hu, 'hits_tot': ht, 'n2nd': n2, 'ambig': am,
        'start2': stv, 'strand2': sd}
tn = [f't{i}'.encode() for i in range(n)]
ts = [codec.decode(refset.codes[int(stv[i]) + 16 : int(stv[i]) + 16 + 90])
      for i in range(n)]
tq = [b'I' * 90 for _ in range(n)]
import io as _io
buf = _io.StringIO()
assert ft.render_native(tn, ts, tq, outs, 128, 16, 96, True, False, buf)
buf = _io.StringIO()
assert ft.render_pairs_native(tn, ts, tq, outs, 128, 16, 96, 0, 500,
                              True, False, buf)

# fl_single_rs + fl_hit_count via the native pair path explicitly
for a, b in list(zip(reads[::2], reads[1::2]))[:40]:
    out = eng._rmap_pair_native(a, b)

# split mode (-p): secondary complement-segment pass + PARTIAL records
from smalt_tpu.map.engine import (RMAPFLG_SPLIT, RMAPFLG_NOSHRTINFO,
                                  RMAPFLG_SENSITIVE)
from smalt_tpu.results.pairs import RESULTFLG_SPLIT
ps = MapParams()
ps.rmapflg |= RMAPFLG_SPLIT | RMAPFLG_NOSHRTINFO | RMAPFLG_SENSITIVE
ps.rsltouflg |= RESULTFLG_SPLIT
engp = MapEngine(refset, idx, ps)
lanep = FastLane.make(engp, 'sam', True, False, False, False)
assert lanep is not None
chim_n, chim_s, chim_q = [], [], []
for i in range(32):
    sa = int(rng.integers(0, refset.total_len - 400))
    sb = int(rng.integers(0, refset.total_len - 400))
    s = (codec.decode(refset.codes[sa : sa + 50]) +
         codec.decode(refset.codes[sb : sb + 50]))
    chim_n.append(f'c{i}'.encode()); chim_s.append(s)
    chim_q.append(b'5' * len(s))
text = lanep.render_raw_block(chim_n, chim_s, chim_q)
assert text is not None

# C pair lane (fl_map_pair_block) incl. the -g cumulative-histogram arm
# of flp_assign_prob: a repeat-planted genome makes n_pairs >= 2 so the
# in-range lookup actually executes under ASan
import tempfile
from smalt_tpu.map.fastlane import PairLane
from smalt_tpu.results.insert import InsHist, InsSample
bases = np.array(list(b'ACGT'), np.uint8)
gg = rng.choice(bases, 120_000)
unit = rng.choice(bases, 800)
for _ in range(6):
    cp = unit.copy()
    for j in rng.integers(0, len(cp), 6):
        cp[j] = bases[int(rng.integers(0, 4))]
    at = int(rng.integers(0, len(gg) - len(cp)))
    gg[at:at + len(cp)] = cp
gtxt = gg.tobytes().decode()
with tempfile.NamedTemporaryFile('w', suffix='.fa', delete=False) as gf:
    gf.write('>rep\n')
    for i in range(0, len(gtxt), 60):
        gf.write(gtxt[i:i + 60] + '\n')
    gpath = gf.name
refr = RefSet.from_fasta(gpath)
idxr = build_index(refr, 13, 2)
engr = MapEngine(refr, idxr, MapParams())
samp = InsSample()
for v in range(230, 560, 2):
    samp.add(v)
ih = InsHist.from_sample(samp)
ih.smooth_gauss()
pl = PairLane.make(engr, 'sam', True, False, False, False, ih)
assert pl is not None
comp = bytes.maketrans(b'ACGT', b'TGCA')
pA, pB = [], []
for i in range(48):
    ins = 300 + int(rng.integers(0, 150))
    st = int(rng.integers(0, len(gtxt) - ins))
    frag = gtxt[st:st + ins].encode()
    a, b = frag[:100], frag[-100:].translate(comp)[::-1]
    pA.append(Read(name=f'pa{i}', seq=codec.encode(a), qual=b'5' * 100))
    pB.append(Read(name=f'pa{i}', seq=codec.encode(b), qual=b'5' * 100))
res = pl._call(pA, pB)
assert res is not None and res[1] > 0, res
# raw-bytes entry (codes_are_ascii + names_raw): ASCII encode and the
# SAM name cut run in C
nmA = [f'pa{i}/1'.encode() for i in range(48)]
sqA = []
sqB = []
for i in range(48):
    ins = 300 + int(rng.integers(0, 150))
    st = int(rng.integers(0, len(gtxt) - ins))
    frag = gtxt[st:st + ins].encode()
    sqA.append(frag[:100])
    sqB.append(frag[-100:].translate(comp)[::-1])
qs = [b'5' * 100] * 48
res = pl._call_raw(nmA, sqA, qs, nmA, sqB, qs)
assert res is not None and res[1] > 0, res
# paired split mode (-p): the full hit-info probe, mapSecondary on
# both mates, and the PARTIAL report chain inside fl_map_pair_block —
# chimeric mates make the secondary pass actually append results
psr = MapParams()
psr.rmapflg |= RMAPFLG_SPLIT | RMAPFLG_NOSHRTINFO | RMAPFLG_SENSITIVE
psr.rsltouflg |= RESULTFLG_SPLIT
engsp = MapEngine(refr, idxr, psr)
plsp = PairLane.make(engsp, 'sam', True, False, False, False, None)
assert plsp is not None
cA, cB = [], []
for i in range(32):
    sa = int(rng.integers(0, len(gtxt) - 300))
    sb = int(rng.integers(0, len(gtxt) - 300))
    chim = (gtxt[sa:sa + 60] + gtxt[sb:sb + 60]).encode()
    mate = gtxt[sb:sb + 100].encode().translate(comp)[::-1]
    cA.append(Read(name=f'cs{i}', seq=codec.encode(chim),
                   qual=b'5' * len(chim)))
    cB.append(Read(name=f'cs{i}', seq=codec.encode(mate),
                   qual=b'5' * len(mate)))
res = plsp._call(cA, cB)
assert res is not None and res[1] > 0, res

# device-exact C halves (fl_exact_pre_block with the host hit
# expansion, fl_exact_post_block, the hdr[7] restage arm of
# fl_pass2_block) — the device leg is faked: rows come from the host
# C collation packed into the pool format, scores all -1, which fails
# the is_simd cross-check and exercises the per-read restage path
from smalt_tpu.map.fastlane import DeviceExact
engx = MapEngine(refr, idxr, MapParams())
dx = DeviceExact.make(engx, 'sam', True, False, False, False, batch=64)
assert dx is not None and dx._host_hits
dn, ds, dq = [], [], []
for i in range(64):
    st = int(rng.integers(0, len(gtxt) - 100))
    dn.append(f'dx{i}'.encode())
    ds.append(gtxt[st:st + 100].encode())
    dq.append(b'5' * 100)
ro = np.zeros(65, np.int64); np.cumsum([100] * 64, out=ro[1:])
cods = np.frombuffer(b''.join(ds), np.uint8)
qarr = np.frombuffer(b''.join(dq), np.uint8)
hq = np.ones(64, np.uint8)
# both pre arms: selmask-only and host-hit-expansion (tiny Hcap forces
# the overflow arm on repeat reads)
st0 = dx._pre(64, cods, ro, qarr, hq, 128)
assert st0 is not None
for hcap in (8, 256):
    st1 = dx._pre(64, cods, ro, qarr, hq, 128, hits_B=64, hits_H=hcap)
    assert st1 is not None
pre, selm, k1, k2, tot, ksq = st1
# fake device outputs: rows from the host oracle, packed; scores -1
from smalt_tpu.seed import hitinfo as hi_mod
pool_rows = []
counts2 = np.zeros((64, 2), np.int32)
for i in range(64):
    rd = Read(name=f'dx{i}', seq=codec.encode(ds[i]), qual=dq[i])
    hf, hr = engx._hitinfo(rd, idxr, True)
    mc = engx._covermin(rd)
    ktup, nskip = idxr.wordlen, idxr.nskip
    mk = (mc - ktup) // nskip if mc >= ktup + nskip else 1
    sac = engx._collect_native(lib if hasattr(lib, 'mc_collect_all')
                               else None, hf, hr, idxr, mk,
                               (mk - 1) * nskip + ktup, None)
    rows = np.asarray(sac.rows_arr)
    for r in rows:
        w0 = (int(r[0]) | (int(r[1]) << 8) | (int(r[7]) << 16) |
              (min(int(r[9]), 255) << 24))
        w5 = (int(r[6]) & 0x3FFFFF) | ((int(r[10]) & 0x1FF) << 22) | \
             ((0x80000000 if (int(r[8]) & 2) else 0))
        pool_rows.append([w0, int(r[2]), int(r[3]), int(r[4]),
                          int(r[5]), np.int32(np.uint32(w5))])
    nf = int(np.sum((rows[:, 8] & 1) == 0)) if len(rows) else 0
    counts2[i] = (nf, len(rows) - nf)
pool = np.zeros((max(len(pool_rows), 1), 6), np.int32)
if pool_rows:
    pool[:len(pool_rows)] = np.asarray(pool_rows, np.int64).astype(np.int32)
scores = np.full(len(pool), -1, np.int32)
cks = np.ascontiguousarray(pre[:, 6:10].reshape(64, 2, 2), np.int32)
fb = np.zeros(64, np.uint8)
stp = dx._post(64, ro, pre, pool, counts2, scores, cks, fb)
assert stp is not None
state, state_offs, nrest = stp
txt = dx._pass2(64, 100, cods, ro, qarr, hq,
                np.frombuffer(b''.join(dn), np.uint8),
                np.concatenate([[0], np.cumsum([len(x) for x in dn])]
                               ).astype(np.int64),
                state, state_offs, scores.astype(np.int64),
                ascii_codes=True, names_raw=True)
assert txt is not None and txt.count(chr(10)) == 64

os.unlink(gpath)
print('ASAN RUN CLEAN')
"""


def test_native_core_asan(tmp_path):
    asan = subprocess.run(["cc", "-print-file-name=libasan.so"],
                          capture_output=True, text=True).stdout.strip()
    if not asan or not os.path.exists(asan):
        pytest.skip("no libasan")
    so = str(tmp_path / "_smalt_asan.so")
    srcs = [os.path.join(ROOT, "smalt_tpu/native/swdp.c"),
            os.path.join(ROOT, "smalt_tpu/native/mapcore.c"),
            os.path.join(ROOT, "smalt_tpu/native/fastlane.c")]
    r = subprocess.run(["cc", "-O1", "-g", "-fsanitize=address", "-shared",
                        "-fPIC", "-o", so] + srcs, capture_output=True)
    if r.returncode != 0:
        pytest.skip("ASan build failed")
    script = DRIVER % {"root": ROOT, "so": so}
    env = dict(os.environ, LD_PRELOAD=asan,
               ASAN_OPTIONS="detect_leaks=0")
    p = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "ASAN RUN CLEAN" in p.stdout
