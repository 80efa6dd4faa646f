"""End-to-end --device-exact timing: C lane vs DX(P2=0) vs DX(P2=1).

Byte-compares all three; prints per-leg rates and the dx-pass2 stage
timing (SMALT_DP1_TIMING lines go to stderr)."""
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("SMALT_DX_BATCH", "8192")

import numpy as np

from bench import _gen_genome, _gen_reads  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
P2 = sys.argv[2] if len(sys.argv) > 2 else "both"

from smalt_tpu.seq.refset import RefSet
from smalt_tpu.index.table import build_index
from smalt_tpu.map.engine import MapEngine, MapParams
from smalt_tpu.map.pipeline import run_pipeline_raw_fastq
from smalt_tpu import rand

rng = np.random.default_rng(12345)
genome = _gen_genome(rng)
fa = "/tmp/_e2edx.fa"
with open(fa, "w") as f:
    f.write(">g\n")
    for i in range(0, len(genome), 70):
        f.write(genome[i:i + 70] + "\n")
reads, _truth = _gen_reads(rng, genome, N)
fq = "/tmp/_e2edx.fq"
with open(fq, "w") as f:
    for i, s in enumerate(reads):
        f.write(f"@x{i}\n{s}\n+\n{'5' * len(s)}\n")

refset = RefSet.from_fasta(fa)
idx = build_index(refset, 13, 2)
_ = idx.addrs

fq_small = "/tmp/_e2edx_warm.fq"
with open(fq_small, "w") as f:
    for i, s in enumerate(reads[:512]):
        f.write(f"@w{i}\n{s}\n+\n{'5' * len(s)}\n")


def leg(device_exact, label):
    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    run_pipeline_raw_fastq(eng, fq_small, io.StringIO(), refset,
                           device_exact=device_exact)
    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    sink = io.StringIO()
    t0 = time.time()
    ok = run_pipeline_raw_fastq(eng, fq, sink, refset,
                                device_exact=device_exact)
    dt = time.time() - t0
    print(f"{label}: {N / dt:.0f} reads/s ({dt:.2f}s) ok={ok}",
          flush=True)
    return sink.getvalue()


legs = {}
if P2 in ("both", "0"):
    os.environ["SMALT_DX_P2"] = "0"
    legs["dx_p2off"] = leg(True, "dx P2=0")
if P2 in ("both", "1"):
    os.environ["SMALT_DX_P2"] = "1"
    legs["dx_p2on"] = leg(True, "dx P2=1")
legs["host"] = leg(False, "pure C")
base = legs["host"]
for k, v in legs.items():
    if k != "host":
        print(f"{k} identical: {v == base}", flush=True)
