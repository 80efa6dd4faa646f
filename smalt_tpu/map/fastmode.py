"""Fast mapping mode: TPU device pass-1 + lean host traceback tail.

This is the production high-throughput configuration promised by the
two-pass design (SURVEY §2.3 P4, rmap.c:588-928 re-expressed): the
fused device step (k-mer lookup, diagonal voting, batched Pallas
Smith-Waterman — smalt_tpu/parallel/mesh.py) scores whole read batches
and returns the best/second window per read; the host then runs the
exact banded traceback (native C, alignment.c:788 recurrence) ONLY on
the winning window of each read and emits SAM.

Fast mode trades the reference's exhaustive candidate search for the
device heuristic: output is reference-STYLE SAM (same fields, flags,
CIGAR/NM/AS conventions, reference mapq formula shape) but NOT
bit-identical to `smalt map` — use the default exact mode for that.
Single-end only.

The input side is a bulk FASTQ reader (bytes.split + one vectorized
codec gather per batch) so parsing keeps up with the device rate; the
traceback/SAM tail fans out over forked workers like the exact
pipeline (threads.c analog).
"""
from __future__ import annotations

import io
import math
import multiprocessing as mp
import sys
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..seq import codec
from ..seq.io import Read, open_maybe_gzip
from ..seq.refset import RefSet
from ..index.table import KmerIndex
from ..align import core as ali_mod
from ..align.band import AliBand, BandError
from ..align import diffstr as ds
from ..report.report import Report, ReportWriter, RepAli, REPMATEFLG

MAPQ_MAX = 60           # results.c:70 MAPSCOR_MAX


# ------------------------------------------------------------------
# bulk FASTQ input
# ------------------------------------------------------------------

def iter_fastq_batches(path: str, batch: int) -> Iterator[
        Tuple[List[bytes], List[bytes], List[Optional[bytes]]]]:
    """Yield (names, seqs, quals) in batches of `batch` reads.
    C-speed parsing: chunked read + bytes.split, no per-line Python."""
    names: List[bytes] = []
    seqs: List[bytes] = []
    quals: List[Optional[bytes]] = []
    tail = b""
    with open_maybe_gzip(path) as f:
        while True:
            chunk = f.read(8 << 20)
            data = tail + chunk
            if not data:
                break
            lines = data.split(b"\n")
            if chunk:
                tail = lines.pop()           # partial last line
            else:
                tail = b""
                if lines and lines[-1] == b"":
                    lines.pop()
            nrec = len(lines) // 4
            for r in range(nrec):
                name = lines[4 * r]
                seq = lines[4 * r + 1]
                qual = lines[4 * r + 3]
                names.append(name[1:].split(b" ", 1)[0].split(b"\t", 1)[0])
                seqs.append(seq)
                quals.append(qual if qual else None)
                if len(names) == batch:
                    yield names, seqs, quals
                    names, seqs, quals = [], [], []
            rest = lines[4 * nrec:]
            tail = b"\n".join(rest + [tail]) if rest else tail
            if not chunk:
                break
    if names:
        yield names, seqs, quals


def encode_batch(seqs: List[bytes], Q: int) -> np.ndarray:
    """[B, Q] uint8 alpha codes, padded with 7 (TERM: invalid words,
    zero scores).  uint8 keeps the host->device transfer small (the
    device step casts to int32 on chip)."""
    B = len(seqs)
    arr = np.full((B, Q), 7, np.uint8)
    flat = codec.alpha(codec.encode(b"".join(s[:Q] for s in seqs)))
    o = 0
    for i, s in enumerate(seqs):
        n = min(len(s), Q)
        arr[i, :n] = flat[o : o + n]
        o += n
    return arr


# ------------------------------------------------------------------
# lean host tail: one traceback + one SAM line per mapped read
# ------------------------------------------------------------------

def fast_mapq(sw1: int, sw2: int, qlen: int) -> int:
    """The reference mapq core (results.c:1310-1334) with n2nd=1 and
    no search-completeness deficit (the device pass has no candidate
    bookkeeping): 250*sw1/qlen*(sw1-sw2)/qlen + 4, clamped [0,60];
    ties -> 0."""
    if sw2 >= sw1:
        return 0
    m = 250.0 * sw1 / qlen * (sw1 - sw2) / qlen + 4.0
    if m > MAPQ_MAX:
        return MAPQ_MAX
    return int(m) if m > 0 else 0


class FastTail:
    """Per-worker traceback + SAM renderer."""

    def __init__(self, refset: RefSet, penalties=(1, -2, -4, -3),
                 minscor: int = 18):
        self.refset = refset
        self.minscor = minscor
        m, go, ge = ali_mod.make_score_matrix(*penalties)
        self.matrix, self.gapopen, self.gapext = m, go, ge
        self.lam = ali_mod.matrix_lambda(m)
        self.avgs = ali_mod.avg_penalties(m)
        self.ref_codes = refset.codes

    def _prof(self, qcodes):
        qa = codec.alpha(qcodes)
        W = np.ascontiguousarray(self.matrix[:, qa], dtype=np.int32)
        return ali_mod.ScoreProfile(
            qcodes=qcodes, W=W, gap_init_pos=-self.gapopen,
            gap_ext_pos=-self.gapext, match_avg=self.avgs[0],
            mismatch_avg=self.avgs[1], gap_init=self.gapopen,
            gap_ext=self.gapext, lam=self.lam)

    def _traceback(self, prof, win_codes, l_edge, r_edge):
        slen = len(win_codes)
        try:
            band = AliBand.make(l_edge, r_edge, 0, prof.qlen - 1,
                                prof.qlen, 0, slen - 1, slen)
        except BandError:
            return None
        sa = np.ascontiguousarray(codec.alpha(win_codes), dtype=np.uint8)
        sc, mi, mj, dirm = ali_mod._align_band_track(prof, sa, band)
        if sc < self.minscor:
            return None
        try:
            (score, ps, pe, ss, se, back,
             _) = ali_mod._make_meta_from_track(prof, sa, band, mi, mj,
                                                sc, dirm, None)
        except ValueError:
            return None
        return score, ps, pe, ss, se, ds.diffstr_reverse(back)

    def render(self, names, seqs, quals, outs, win_len: int, pad: int,
               q_padded: int, writer: ReportWriter) -> None:
        refset = self.refset
        offsets = refset.offsets
        score = outs["score"]
        score2 = outs["score2"]
        start = outs["start"]
        strand = outs["strand"]
        for i, name in enumerate(names):
            seq = seqs[i]
            qlen = len(seq)
            read = Read(name=name.decode(), seq=codec.encode(seq),
                        qual=quals[i])
            rp = None
            if int(score[i]) >= self.minscor and qlen >= 5:
                is_rev = bool(strand[i])
                qcodes = read.seq
                if is_rev:
                    qcodes = codec.revcomp_codes(qcodes)
                prof = self._prof(qcodes)
                ws = int(start[i])
                win = self.ref_codes[ws : ws + win_len]
                # the alignment diagonal sits near the window pad (plus
                # the batch padding shift for RC reads); a narrow band
                # suffices, with a full-band retry whenever the banded
                # score misses the device's full-matrix score
                center = -(pad + (q_padded - qlen)) if is_rev else -pad
                tb = self._traceback(prof, win, center - 24, center + 48)
                if tb is None or tb[0] < int(score[i]):
                    full = self._traceback(prof, win, -(len(win) - 1),
                                           prof.qlen - 1)
                    if full is not None and (tb is None or full[0] > tb[0]):
                        tb = full
                if tb is not None:
                    sw, ps, pe, ss, se, diff = tb
                    g = ws + ss
                    sidx = int(refset.find_seqidx(np.asarray([g]))[0])
                    local = g - int(offsets[sidx]) + 1
                    rp = RepAli()
                    rp.status = REPMATEFLG.MAPPED | (
                        REPMATEFLG.REVERSE if is_rev else 0)
                    rp.swatscor = sw
                    rp.mapscor = fast_mapq(int(score[i]), int(score2[i]),
                                           qlen)
                    rp.q_start = ps + 1
                    rp.q_end = pe + 1
                    rp.s_start = local
                    rp.s_end = local + (se - ss)
                    rp.s_idx = sidx
                    rp.diff = diff
            if rp is None:
                rp = RepAli()   # unmapped record
            writer._write_one(rp, read, None, 0, 0)


# ------------------------------------------------------------------
# driver
# ------------------------------------------------------------------

_g = {}


def _tail_init(refset, penalties, minscor, writer_args):
    _g["tail"] = FastTail(refset, penalties, minscor)
    _g["writer_args"] = writer_args


def _tail_render(args):
    names, seqs, quals, outs, win_len, pad, q_padded = args
    tail = _g["tail"]
    soft, xmm = _g["writer_args"]
    buf = io.StringIO()
    writer = ReportWriter(buf, tail.refset, fmt="sam", soft_clip=soft,
                          x_mismatch=xmm, header=False)
    tail.render(names, seqs, quals, outs, win_len, pad, q_padded, writer)
    return buf.getvalue()


def run_fast_pipeline(refset: RefSet, idx: KmerIndex, reads_path: str,
                      out, penalties=(1, -2, -4, -3), minscor: int = 18,
                      nthreads: int = 1, batch: int = 4096,
                      interpret=None) -> None:
    """Map single-end reads with the device pass + host traceback tail,
    writing SAM records (headerless body; caller writes the header)."""
    import jax
    import jax.numpy as jnp
    from ..parallel.mesh import DeviceIndex, make_device_step

    di = DeviceIndex.build(refset, idx)
    m, go, ge = ali_mod.make_score_matrix(*penalties)
    step = make_device_step(di, m, -go, -ge, interpret=interpret)
    PREFETCH = 4   # device dispatches kept in flight (jax dispatch is
                   # async; forcing outputs N batches behind hides the
                   # dispatch/transfer round-trip latency)

    writer_args = (True, False)   # soft_clip, x_mismatch

    from collections import deque
    from ..parallel.mesh import window_len, window_pad

    def batches():
        pending = deque()

        def force(item):
            names, seqs, quals, o, wl, wp, Q = item
            return (names, seqs, quals,
                    {k: np.asarray(v) for k, v in o.items()}, wl, wp, Q)

        for names, seqs, quals in iter_fastq_batches(reads_path, batch):
            qmax = max((len(s) for s in seqs), default=0)
            # round Q to a small multiple (bounded recompiles) — NOT to
            # 128: the device window formula would jump S to the next
            # 128 multiple and double the SW cost
            Q = max(32, -(-qmax // 16) * 16)
            arr = encode_batch(seqs, Q)
            o = step(jnp.asarray(arr))          # async dispatch
            pending.append((names, seqs, quals, o,
                            window_len(Q), window_pad(Q), Q))
            if len(pending) >= PREFETCH:
                yield force(pending.popleft())
        while pending:
            yield force(pending.popleft())

    if nthreads <= 1:
        _tail_init(refset, penalties, minscor, writer_args)
        for args in batches():
            out.write(_tail_render(args))
        return

    ctx = mp.get_context("fork")
    with ctx.Pool(processes=nthreads, initializer=_tail_init,
                  initargs=(refset, penalties, minscor,
                            writer_args)) as pool:
        for text in pool.imap(_tail_render, batches(), chunksize=1):
            out.write(text)
