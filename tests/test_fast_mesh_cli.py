"""VERDICT r1 item 4: `map --fast` must run the SPMD sharded step from
the CLI and produce byte-identical output to the single-device fast
path, for any mesh shape, on the virtual 8-device CPU mesh."""
import io
import os

import numpy as np
import pytest

from smalt_tpu.map.fastmode import run_fast_pipeline


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from smalt_tpu.seq.refset import RefSet
    from smalt_tpu.index.table import build_index
    rng = np.random.default_rng(31)
    bases = np.array(list(b"ACGT"), np.uint8)
    contigs = [rng.choice(bases, n).tobytes().decode()
               for n in (9000, 7000)]
    d = tmp_path_factory.mktemp("meshcli")
    fa = os.path.join(d, "g.fa")
    with open(fa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">c{i}\n")
            for j in range(0, len(c), 60):
                f.write(c[j : j + 60] + "\n")
    refset = RefSet.from_fasta(fa)
    idx = build_index(refset, 11, 2)
    qlen = 72
    comp = str.maketrans("ACGT", "TGCA")
    recs = []
    genome = "".join(contigs)
    for i in range(90):     # deliberately NOT a multiple of dp=8
        ci = i % 2
        st = int(rng.integers(0, len(contigs[ci]) - qlen))
        s = contigs[ci][st : st + qlen]
        if i % 3 == 0:
            s = s.translate(comp)[::-1]
        recs.append(f"@m{i}\n{s}\n+\n{'I' * qlen}\n")
    fq = os.path.join(d, "r.fq")
    open(fq, "w").write("".join(recs))
    return refset, idx, fq


def _run(world, mesh_spec):
    refset, idx, fq = world
    buf = io.StringIO()
    run_fast_pipeline(refset, idx, fq, buf, nthreads=1, batch=32,
                      interpret=True, mesh_spec=mesh_spec)
    return buf.getvalue()


def test_mesh_output_identical(world):
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    single = _run(world, None)
    assert single.count("\n") == 90
    for spec in ("8,1", "4,2"):
        assert _run(world, spec) == single, f"mesh {spec} diverged"


def test_mesh_cli_flag(world, tmp_path):
    """The --mesh flag reaches the pipeline through the CLI."""
    import jax
    if jax.device_count() < 4:
        pytest.skip("needs the virtual CPU mesh")
    refset, idx, fq = world
    import subprocess, sys  # noqa: F401  (in-process: jax already up)
    from smalt_tpu import cli
    d = str(tmp_path)
    # persist the index artifacts for the CLI
    prefix = os.path.join(d, "idx")
    refset.save(prefix)
    idx.save(prefix)
    out1 = os.path.join(d, "a.sam")
    out2 = os.path.join(d, "b.sam")
    assert cli.cmd_map(["--fast", "-o", out1, prefix, fq]) == 0
    assert cli.cmd_map(["--fast", "--mesh", "4,1", "-o", out2,
                        prefix, fq]) == 0

    def body(p):
        return [l for l in open(p) if not l.startswith("@")]

    assert body(out1) == body(out2)
