"""PE device-exact stage diagnosis: run the bench's PE devx leg with
SMALT_DP1_TIMING to see where the 0.708x-vs-host gap goes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["SMALT_DP1_TIMING"] = "1"
os.environ.setdefault("SMALT_DX_BATCH",
                      sys.argv[2] if len(sys.argv) > 2 else "8192")

import numpy as np
from bench import _gen_genome, _bench_exact_pe_devx
import tempfile

rng = np.random.default_rng(123)
genome = _gen_genome(rng)
with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
    f.write(">ecoli_sim\n")
    for i in range(0, len(genome), 60):
        f.write(genome[i:i + 60] + "\n")
    fa = f.name
dx, adj, ident = _bench_exact_pe_devx(fa, genome, rng)
print(f"pe devx {dx:.0f} adjacent {adj:.0f} ratio {dx/adj:.3f} "
      f"identical {ident}")
os.unlink(fa)
