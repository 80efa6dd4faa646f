"""Fast mode (device pass-1 + host traceback tail): end-to-end SAM on
the virtual CPU backend.  Checks mapping accuracy against simulated
truth and SAM well-formedness; fast mode is reference-STYLE output,
not bit-identical (the exact path covers that)."""
import io
import os

import numpy as np
import pytest

from smalt_tpu.seq.refset import RefSet
from smalt_tpu.index.table import build_index
from smalt_tpu.map.fastmode import (run_fast_pipeline, iter_fastq_batches,
                                    encode_batch, fast_mapq)


@pytest.fixture(scope="module")
def simulated(tmp_path_factory, indexed):
    refset, idx = indexed
    rng = np.random.default_rng(5)
    from smalt_tpu.seq import codec
    n = 200
    qlen = 80
    lines = []
    truth = []
    for i in range(n):
        st = int(rng.integers(0, refset.total_len - qlen))
        seg = codec.decode(refset.codes[st : st + qlen]).decode()
        seg = list(seg)
        for j in np.flatnonzero(rng.random(qlen) < 0.02):
            seg[j] = "ACGT"[int(rng.integers(0, 4))]
        s = "".join(seg)
        rev = i % 2 == 1
        if rev:
            s = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        lines.append(f"@r{i}\n{s}\n+\n{'I' * qlen}\n")
        truth.append((st, rev))
    d = tmp_path_factory.mktemp("fast")
    fq = os.path.join(d, "reads.fq")
    with open(fq, "w") as f:
        f.write("".join(lines))
    return refset, idx, fq, truth, qlen


def test_batch_reader_roundtrip(simulated):
    refset, idx, fq, truth, qlen = simulated
    tot = 0
    for names, seqs, quals in iter_fastq_batches(fq, 64):
        assert len(names) == len(seqs) == len(quals)
        for nm, s, q in zip(names, seqs, quals):
            assert nm.startswith(b"r")
            assert len(s) == qlen and len(q) == qlen
        tot += len(names)
    assert tot == len(truth)
    arr = encode_batch([b"ACGTN"], 8)
    assert arr.tolist() == [[0, 1, 2, 3, 5, 7, 7, 7]]


def test_fast_pipeline_accuracy(simulated):
    refset, idx, fq, truth, qlen = simulated
    buf = io.StringIO()
    run_fast_pipeline(refset, idx, fq, buf, nthreads=1, batch=64,
                      interpret=True)
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == len(truth)
    offsets = refset.offsets
    name2idx = {refset.sam_name(s): s for s in range(refset.nseq)}
    ok = 0
    for line in lines:
        f = line.split("\t")
        rno = int(f[0][1:])
        flag = int(f[1])
        st, rev = truth[rno]
        if flag & 4:
            continue
        assert (flag & 16 == 16) == rev, line
        pos = int(offsets[name2idx[f[2]]]) + int(f[3]) - 1
        if abs(pos - st) <= 8:
            ok += 1
        # CIGAR consumes the full read
        import re
        span = sum(int(n) for n, op in re.findall(r"(\d+)([MIS=X])", f[5]))
        assert span == qlen, line
        assert f[11].startswith("NM:i:") and f[12].startswith("AS:i:")
    assert ok >= 0.97 * len(truth), f"only {ok}/{len(truth)} on-target"


def test_fast_mapq_shape():
    assert fast_mapq(100, 100, 100) == 0
    assert fast_mapq(100, 0, 100) == 60
    assert 0 < fast_mapq(60, 50, 100) <= 60
