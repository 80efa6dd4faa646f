"""C FASTQ scanner (fl_fastq_scan) parity with the Python parser."""
import gzip

import numpy as np
import pytest

from smalt_tpu.map.fastmode import (RawBatch, iter_fastq_batches,
                                    iter_fastq_hybrid)


def _recs(n, rng):
    out = []
    for i in range(n):
        L = int(rng.integers(30, 150))
        seq = "".join(rng.choice(list("ACGTN"), L))
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, L))
        out.append(f"@read_{i} extra field\n{seq}\n+\n{q}\n")
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_scanner_parity(tmp_path, gz):
    rng = np.random.default_rng(5)
    data = "".join(_recs(3000, rng)).encode()
    path = tmp_path / ("r.fq.gz" if gz else "r.fq")
    path.write_bytes(gzip.compress(data) if gz else data)
    a = [x for t in iter_fastq_batches(str(path), 512) for x in zip(*t)]
    b = []
    for item in iter_fastq_hybrid(str(path), 512):
        assert isinstance(item, RawBatch)
        b.extend(zip(*item.as_lists()))
    assert len(a) == len(b) == 3000
    assert a == b


def test_scanner_no_trailing_newline(tmp_path):
    rng = np.random.default_rng(6)
    data = "".join(_recs(10, rng)).encode()[:-1]
    path = tmp_path / "r.fq"
    path.write_bytes(data)
    a = [x for t in iter_fastq_batches(str(path), 4) for x in zip(*t)]
    b = [x for it in iter_fastq_hybrid(str(path), 4)
         for x in zip(*it.as_lists())]
    assert a == b and len(a) == 10


def test_scanner_crlf_falls_back(tmp_path):
    """\\r line endings are not the scanner's shape: the hybrid
    iterator degrades to the Python list parser (same records)."""
    rng = np.random.default_rng(8)
    data = "".join(_recs(8, rng)).replace("\n", "\r\n").encode()
    path = tmp_path / "r.fq"
    path.write_bytes(data)
    a = [x for t in iter_fastq_batches(str(path), 4) for x in zip(*t)]
    got = []
    for item in iter_fastq_hybrid(str(path), 4):
        if isinstance(item, RawBatch):
            got.extend(zip(*item.as_lists()))
        else:
            got.extend(zip(*item))
    assert got == a


def test_scanner_encode_matches_python(tmp_path):
    from smalt_tpu.map.fastmode import encode_batch
    rng = np.random.default_rng(9)
    data = "".join(_recs(200, rng)).encode()
    path = tmp_path / "r.fq"
    path.write_bytes(data)
    for item in iter_fastq_hybrid(str(path), 64):
        names, seqs, quals = item.as_lists()
        Q = -(-max(len(s) for s in seqs) // 16) * 16
        np.testing.assert_array_equal(item.encode(Q),
                                      encode_batch(seqs, Q))
