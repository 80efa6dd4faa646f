"""Batch-granular checkpoint/resume (SURVEY §5): a run killed mid-way
and restarted with --resume must produce byte-identical output to an
uninterrupted run — for the exact serial SE lane and for fast mode."""
import io
import os
import json

import numpy as np
import pytest

from smalt_tpu import cli


def _body(path):
    """Records only — the @PG header embeds the command line, which
    legitimately differs between the reference and resumed runs."""
    return [l for l in open(path) if not l.startswith("@")]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(73)
    bases = np.array(list(b"ACGT"), np.uint8)
    g = rng.choice(bases, 20000).tobytes().decode()
    d = tmp_path_factory.mktemp("resume")
    fa = os.path.join(d, "g.fa")
    open(fa, "w").write(">g\n" + g + "\n")
    assert cli.cmd_index(["-k", "11", "-s", "2",
                          os.path.join(d, "idx"), fa]) == 0
    qlen = 75
    comp = str.maketrans("ACGT", "TGCA")
    recs = []
    # enough reads for several checkpoints (exact lane batches = 1024;
    # checkpoint every 32 batches is too coarse for a test, so the
    # test monkeypatches CHECKPOINT_BATCHES)
    for i in range(3000):
        st = int(rng.integers(0, len(g) - qlen))
        s = g[st : st + qlen]
        if i % 2:
            s = s.translate(comp)[::-1]
        recs.append(f"@r{i}\n{s}\n+\n{'I' * qlen}\n")
    fq = os.path.join(d, "r.fq")
    open(fq, "w").write("".join(recs))
    return os.path.join(d, "idx"), fq, str(d)


def _interrupted_run(argv, out, n_batches_then_die, monkeypatch):
    """Run cmd_map but kill it after N checkpoint ticks."""
    from smalt_tpu import resume as rz

    class Boom(Exception):
        pass

    orig_tick = rz.ResumeLog.tick
    calls = {"n": 0}

    def tick(self, reads_done, out_bytes, rng):
        orig_tick(self, reads_done, out_bytes, rng)
        calls["n"] += 1
        if calls["n"] >= n_batches_then_die:
            raise Boom()

    monkeypatch.setattr(rz.ResumeLog, "tick", tick)
    monkeypatch.setattr(rz, "CHECKPOINT_BATCHES", 1)
    try:
        cli.cmd_map(argv)
        return False
    except Boom:
        return True
    finally:
        monkeypatch.setattr(rz.ResumeLog, "tick", orig_tick)


def test_exact_resume_byte_identical(world, tmp_path, monkeypatch):
    idx, fq, d = world
    ref_out = os.path.join(tmp_path, "full.sam")
    assert cli.cmd_map(["-r", "1", "-o", ref_out, idx, fq]) == 0

    out = os.path.join(tmp_path, "resumed.sam")
    killed = _interrupted_run(["-r", "1", "-o", out, "--resume",
                               idx, fq], out, 2, monkeypatch)
    assert killed, "run was expected to die mid-way"
    assert os.path.exists(out + ".resume")
    from smalt_tpu import resume as rz
    monkeypatch.setattr(rz, "CHECKPOINT_BATCHES", 1)
    assert cli.cmd_map(["-r", "1", "-o", out, "--resume", idx, fq]) == 0
    assert not os.path.exists(out + ".resume")
    assert _body(out) == _body(ref_out)


def test_fast_resume_byte_identical(world, tmp_path, monkeypatch):
    import jax
    idx, fq, d = world
    monkeypatch.setenv("SMALT_FAST_BATCH", "512")
    ref_out = os.path.join(tmp_path, "fastfull.sam")
    assert cli.cmd_map(["--fast", "-o", ref_out, idx, fq]) == 0

    out = os.path.join(tmp_path, "fastresumed.sam")
    killed = _interrupted_run(["--fast", "-o", out, "--resume",
                               idx, fq], out, 2, monkeypatch)
    assert killed
    from smalt_tpu import resume as rz
    monkeypatch.setattr(rz, "CHECKPOINT_BATCHES", 1)
    assert cli.cmd_map(["--fast", "-o", out, "--resume", idx, fq]) == 0
    assert _body(out) == _body(ref_out)


def test_device_exact_resume_byte_identical(world, tmp_path, monkeypatch):
    """--device-exact + --resume compose: kill mid-run, resume, output
    byte-identical to the uninterrupted device-exact run (which itself
    is byte-identical to the host lane)."""
    idx, fq, d = world
    monkeypatch.setenv("SMALT_DX_BATCH", "512")
    monkeypatch.setenv("SMALT_DX_P2", "1")   # device pass-2 opt-in
    ref_out = os.path.join(tmp_path, "dxfull.sam")
    assert cli.cmd_map(["-r", "1", "-o", ref_out, idx, fq]) == 0

    out = os.path.join(tmp_path, "dxresumed.sam")
    killed = _interrupted_run(["-r", "1", "-o", out, "--resume",
                               "--device-exact", idx, fq], out, 2,
                              monkeypatch)
    assert killed, "run was expected to die mid-way"
    assert os.path.exists(out + ".resume")
    from smalt_tpu import resume as rz
    monkeypatch.setattr(rz, "CHECKPOINT_BATCHES", 1)
    assert cli.cmd_map(["-r", "1", "-o", out, "--resume",
                        "--device-exact", idx, fq]) == 0
    assert not os.path.exists(out + ".resume")
    assert _body(out) == _body(ref_out)


def test_resume_refuses_changed_args(world, tmp_path):
    idx, fq, d = world
    out = os.path.join(tmp_path, "x.sam")
    from smalt_tpu.resume import ResumeLog
    log = ResumeLog(out, ["map", "-r", "1"])
    open(out, "w").write("data\n")
    log.save(1024, 5, 0)
    other = ResumeLog(out, ["map", "-r", "2"])
    with pytest.raises(ValueError):
        other.load()
