"""Native BAM codec: map to BAM and to SAM on the same inputs and
assert record-for-record equality after decoding; then feed the BAM
back as input (-F bam) and require the same mappings as from FASTQ.
(The reference can only do BAM through the optional bambamc library.)
"""
import os

import pytest

from smalt_tpu.cli import main
from smalt_tpu.report.bam import read_bam


@pytest.fixture(scope="module")
def index_prefix(tmp_path_factory, data_dir):
    d = tmp_path_factory.mktemp("bamidx")
    pref = str(d / "idx")
    assert main(["index", "-k", "13", "-s", "4", pref,
                 os.path.join(data_dir, "genome.fa")]) == 0
    return pref


def _sam_records(path):
    out = []
    for ln in open(path).read().splitlines():
        if ln.startswith("@"):
            continue
        f = ln.split("\t")
        tags = {t.split(":")[0]: int(t.split(":")[2]) for t in f[11:]
                if t.split(":")[1] == "i"}
        out.append((f[0], int(f[1]), f[2], int(f[3]), int(f[4]), f[5],
                    f[6], int(f[7]), int(f[8]), f[9], f[10], tags))
    return out


def _bam_records(path, names_by_id):
    text, refs, recs = read_bam(path)
    out = []
    for r in recs:
        cig = "".join(f"{n}{c}" for n, c in r.cigar) if r.cigar else "*"
        rn = refs[r.ref_id] if r.ref_id >= 0 else "*"
        out.append((r.name, r.flag, rn, r.pos if r.ref_id >= 0 else 0,
                    r.mapq, cig, r.seq, r.qual, r.tags))
    return text, refs, out


@pytest.mark.parametrize("paired", [False, True])
def test_bam_equals_sam(index_prefix, data_dir, tmp_path, paired):
    if paired:
        inputs = [os.path.join(data_dir, "reads_pe_1.fq"),
                  os.path.join(data_dir, "reads_pe_2.fq")]
    else:
        inputs = [os.path.join(data_dir, "reads_se.fq.gz")]
    sam = str(tmp_path / f"o{paired}.sam")
    bam = str(tmp_path / f"o{paired}.bam")
    assert main(["map", "-f", "sam", "-r", "1", "-o", sam, index_prefix]
                + inputs) == 0
    assert main(["map", "-f", "bam", "-r", "1", "-o", bam, index_prefix]
                + inputs) == 0
    srecs = _sam_records(sam)
    text, refs, brecs = _bam_records(bam, None)
    assert "@SQ" in text and "@PG" in text
    assert len(brecs) == len(srecs)
    for s, b in zip(srecs, brecs):
        name, flag, rname, pos, mapq, cig, rnext, pnext, tlen, seq, \
            qual, tags = s
        bname, bflag, brname, bpos, bmapq, bcig, bseq, bqual, btags = b
        assert bname == name and bflag == flag, (s, b)
        assert brname == rname and bpos == pos and bmapq == mapq, (s, b)
        assert bcig == cig, (s, b)
        assert bseq == seq and bqual == (qual if qual != "*" else "")
        assert btags.get("NM") == tags.get("NM")
        assert btags.get("AS") == tags.get("AS")


def test_bam_as_input(index_prefix, data_dir, tmp_path):
    """-F bam: mapping reads staged through our own BAM must equal the
    FASTQ run (infmt.c's SAM/BAM input path, natively)."""
    fq = os.path.join(data_dir, "reads_se.fq.gz")
    sam1 = str(tmp_path / "a.sam")
    bam = str(tmp_path / "stage.bam")
    sam2 = str(tmp_path / "b.sam")
    assert main(["map", "-f", "sam", "-r", "1", "-o", sam1, index_prefix,
                 fq]) == 0
    assert main(["map", "-f", "bam", "-r", "1", "-o", bam, index_prefix,
                 fq]) == 0
    assert main(["map", "-f", "sam", "-r", "1", "-F", "bam", "-o", sam2,
                 index_prefix, bam]) == 0
    a = [l for l in open(sam1).read().splitlines() if not l.startswith("@")]
    b = [l for l in open(sam2).read().splitlines() if not l.startswith("@")]
    assert a == b


def test_bgzf_gzip_compatible(index_prefix, data_dir, tmp_path):
    """BGZF output must be readable by plain gzip (spec requirement)."""
    import gzip
    bam = str(tmp_path / "z.bam")
    assert main(["map", "-f", "bam", "-r", "1", "-o", bam, index_prefix,
                 os.path.join(data_dir, "reads_se.fq.gz")]) == 0
    with gzip.open(bam, "rb") as f:
        assert f.read(4) == b"BAM\x01"


def test_bgzf_bsize_block_walk(index_prefix, data_dir, tmp_path):
    """Walk the BGZF container via the BSIZE extra field alone (the way
    htslib/IGV seek blocks, SAM spec 4.1): every block must inflate and
    pass its CRC32/ISIZE footer, and the file must end in the EOF block."""
    import struct
    import zlib
    from smalt_tpu.report.bam import BGZF_EOF

    bam = str(tmp_path / "w.bam")
    assert main(["map", "-f", "bam", "-r", "1", "-o", bam, index_prefix,
                 os.path.join(data_dir, "reads_se.fq.gz")]) == 0
    data = open(bam, "rb").read()
    off = 0
    nblocks = 0
    payload = bytearray()
    while off < len(data):
        assert data[off:off + 4] == b"\x1f\x8b\x08\x04"
        (xlen,) = struct.unpack_from("<H", data, off + 10)
        # scan extra subfields for BC
        p, bsize = off + 12, None
        while p < off + 12 + xlen:
            si1, si2, slen = data[p], data[p + 1], \
                struct.unpack_from("<H", data, p + 2)[0]
            if (si1, si2) == (66, 67):
                (bsize,) = struct.unpack_from("<H", data, p + 4)
            p += 4 + slen
        assert bsize is not None
        total = bsize + 1
        cdata = data[off + 12 + xlen : off + total - 8]
        crc, isize = struct.unpack_from("<II", data, off + total - 8)
        raw = zlib.decompress(cdata, -15)
        assert len(raw) == isize
        assert (zlib.crc32(raw) & 0xFFFFFFFF) == crc
        payload += raw
        off += total
        nblocks += 1
    assert off == len(data)
    assert data.endswith(BGZF_EOF)
    assert nblocks >= 2
    assert payload[:4] == b"BAM\x01"


def test_bam_lane_byte_identical(index_prefix, data_dir, tmp_path,
                                 monkeypatch):
    """-f bam through the C lane (SAM text -> SamTextEncoder records)
    must produce the BYTE-identical BAM container vs the Python
    Report-object path (same output filename so the @PG CL line
    matches)."""
    out = str(tmp_path / "o.bam")
    args = ["map", "-f", "bam", "-r", "1", "-o", out, index_prefix,
            os.path.join(data_dir, "reads_se.fq.gz")]
    assert main(args) == 0
    fast = open(out, "rb").read()
    monkeypatch.setenv("SMALT_TPU_NO_FASTLANE", "1")
    assert main(args) == 0
    assert open(out, "rb").read() == fast

    # paired: the pair lane + SAM->BAM re-encode
    args = ["map", "-f", "bam", "-r", "1", "-o", out, index_prefix,
            os.path.join(data_dir, "reads_pe_1.fq"),
            os.path.join(data_dir, "reads_pe_2.fq")]
    monkeypatch.delenv("SMALT_TPU_NO_FASTLANE")
    assert main(args) == 0
    fast = open(out, "rb").read()
    monkeypatch.setenv("SMALT_TPU_NO_FASTLANE", "1")
    assert main(args) == 0
    assert open(out, "rb").read() == fast
