"""Per-read report collection and output writers.

Replicates report.c: the Report gathers REPALI records for read (A)
and mate (B) with duplicate folding (findREPALI, report.c:554-586),
REPPAIR records linking mates, multi-primary fixup (report.c:1719),
and the writers: SAM lines (fprintREPALIsam, report.c:762-906), SAM
header (report.c:1266), CIGAR lines (report.c:591-646).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, TextIO

import numpy as np

from ..seq import codec
from ..seq.io import Read
from ..align import diffstr as ds


class REPMATEFLG:
    MAPPED = 0x01
    REVERSE = 0x02
    PAIRED = 0x04
    MATE2 = 0x08
    PRIMARY = 0x10
    PARTIAL = 0x20
    MULTI = 0x40


class REPPAIR:
    MAPPED = 0x01
    CONTIG = 0x02
    PROPER = 0x04
    WITHIN = 0x08


class SAMFLAG:
    PAIRED = 0x0001
    PROPER = 0x0002
    NOMAP = 0x0004
    MATENOMAP = 0x0008
    STRAND = 0x0010
    MATESTRAND = 0x0020
    MATE1 = 0x0040
    MATE2 = 0x0080
    NOTPRIMARY = 0x0100


@dataclass
class RepAli:
    status: int = 0
    swatscor: int = 0
    mapscor: int = 0
    q_start: int = 0
    q_end: int = 0
    s_start: int = 0
    s_end: int = 0
    s_idx: int = 0
    diff: List[int] = field(default_factory=list)
    was_output: bool = False


@dataclass
class RepPair:
    pairflg: int = 0
    isize: int = 0
    iA: int = -1
    iB: int = -1


class Report:
    def __init__(self):
        self.arA: List[RepAli] = []
        self.arB: List[RepAli] = []
        self.pairs: List[RepPair] = []

    def blank(self):
        self.__init__()

    def next_pair_id(self) -> int:
        """reportNextPairID (report.c:1581-1594)."""
        self.pairs.append(RepPair())
        return len(self.pairs) - 1

    def _find(self, arr: List[RepAli], q_start, q_end, mateflg,
              s_start, s_end, s_idx) -> int:
        mask = REPMATEFLG.REVERSE | REPMATEFLG.MATE2
        for i in range(len(arr) - 1, -1, -1):
            r = arr[i]
            if (s_start == r.s_start and s_end == r.s_end and
                    s_idx == r.s_idx and q_start == r.q_start and
                    q_end == r.q_end and
                    (mateflg & mask) == (r.status & mask)):
                return i
        return -1

    def add_map(self, pairid: int, swatscor: int, mapscor: int,
                q_start: int, q_end: int, s_start: int, s_end: int,
                s_idx: int, diff: Optional[List[int]], insiz: int,
                mateflg: int, pairflg: int):
        """reportAddMap (report.c:1596-1717)."""
        if diff is None or len(diff) < 1:
            mateflg &= ~REPMATEFLG.MAPPED

        pp = None
        if (mateflg & REPMATEFLG.PAIRED) and pairid >= 0:
            pp = self.pairs[pairid]
            if pp.pairflg == 0:
                pp.pairflg = pairflg
            elif pp.pairflg != pairflg:
                raise AssertionError("inconsistent pair flags")

        rp = None
        if pp is not None and (mateflg & REPMATEFLG.MATE2):
            if pp.iA >= 0:
                if insiz != pp.isize:
                    raise AssertionError("inconsistent insert size")
                idx = self._find(self.arB, q_start, q_end, mateflg,
                                 s_start, s_end, s_idx)
                if idx < 0:
                    pp.iB = len(self.arB)
                    rp = RepAli()
                    self.arB.append(rp)
                else:
                    pp.iB = idx
                    rp = self.arB[idx]
            else:
                pp.isize = insiz
        else:
            arr = self.arA
            if pp is None:
                if mateflg & REPMATEFLG.MATE2:
                    arr = self.arB
            else:
                if pp.iB >= 0:
                    if insiz != pp.isize:
                        raise AssertionError("inconsistent insert size")
                else:
                    pp.isize = insiz
            idx = self._find(arr, q_start, q_end, mateflg,
                             s_start, s_end, s_idx)
            if idx < 0:
                if pp is not None:
                    pp.iA = len(self.arA)
                rp = RepAli()
                arr.append(rp)
            else:
                if pp is None:
                    rp = None  # known single mapping -> ignore
                else:
                    pp.iA = idx
                    rp = arr[idx]

        if rp is not None:
            rp.status = mateflg
            if mateflg & REPMATEFLG.MAPPED:
                rp.swatscor = swatscor
                rp.mapscor = mapscor
                rp.q_start = q_start
                rp.q_end = q_end
                rp.s_start = s_start
                rp.s_end = s_end
                rp.s_idx = s_idx
                rp.diff = list(diff)
            else:
                rp.swatscor = rp.mapscor = 0
                rp.q_start = rp.q_end = rp.s_start = rp.s_end = rp.s_idx = 0
                rp.diff = []

    def fix_multiple_primary(self):
        """reportFixMultiplePrimary (report.c:1719-1757)."""
        npA = npB = 0
        for pp in self.pairs:
            if npA >= 2 and npB >= 2:
                break
            if self.arA[pp.iA].status & REPMATEFLG.PRIMARY:
                npA += 1
            # reference quirk: tests arAr[pp->iB] (report.c:1731)
            if self.arA[pp.iB].status & REPMATEFLG.PRIMARY:
                npB += 1
        if npA < 2:
            if npA > 0:
                npA = 0
            for r in self.arA:
                if npA >= 2:
                    break
                if r.status & REPMATEFLG.PRIMARY:
                    npA += 1
        if npB < 2:
            if npB > 0:
                npB = 0
            for r in self.arB:
                if npB >= 2:
                    break
                if r.status & REPMATEFLG.PRIMARY:
                    npB += 1
        if npA > 1:
            for r in self.arA:
                r.status &= ~REPMATEFLG.PRIMARY
        if npB > 1:
            for r in self.arB:
                r.status &= ~REPMATEFLG.PRIMARY


# ---------------------------------------------------------------------------


class ReportWriter:
    """SAM/CIGAR stream writer (ReportWriter, report.c:1350-1500)."""

    def __init__(self, fp: TextIO, refset, fmt: str = "sam",
                 soft_clip: bool = True, x_mismatch: bool = False,
                 header: bool = True, prog_args: Optional[List[str]] = None,
                 version: str = "0.7.6"):
        self.fp = fp
        self.refset = refset
        self.fmt = fmt
        self.soft_clip = soft_clip
        self.x_mismatch = x_mismatch
        if fmt == "sam" and header:
            self._write_sam_header(prog_args or [], version)

    def _write_sam_header(self, args: List[str], version: str):
        fp = self.fp
        fp.write("@HD\tVN:1.3\tSO:unknown\n")
        for s in range(self.refset.nseq):
            fp.write(f"@SQ\tSN:{self.refset.sam_name(s)}\tLN:{self.refset.seq_len(s)}\n")
        fp.write(f"@PG\tID:smalt\tPN:smalt\tVN:{version}\tCL:")
        fp.write(" ".join(args))
        fp.write("\n")

    # --- per-read output (reportWrite, report.c:1758-1864) ---

    def write(self, report: Report, read: Read, mate: Optional[Read]):
        for r in report.arA:
            r.was_output = False
        for r in report.arB:
            r.was_output = False
        for pp in report.pairs:
            ap = report.arA[pp.iA]
            bp = report.arB[pp.iB]
            ap.was_output = True
            bp.was_output = True
            self._write_one(ap, read, bp, pp.isize, pp.pairflg)
            self._write_one(bp, mate, ap, pp.isize, pp.pairflg)
        pairflg = report.pairs[0].pairflg if report.pairs else 0
        for ap in report.arA:
            if not ap.was_output:
                self._write_one(ap, read, None, 0, pairflg)
        for bp in report.arB:
            if not bp.was_output:
                self._write_one(bp, mate, None, 0, pairflg)

    def _write_one(self, rp: RepAli, read: Read, mp: Optional[RepAli],
                   isize: int, pairflg: int):
        if rp is not None and (rp.status & REPMATEFLG.MAPPED) and \
           mp is not None and rp.s_idx == mp.s_idx:
            pairflg |= REPPAIR.CONTIG
        if self.fmt == "sam":
            self._write_sam(rp, read, mp, isize, pairflg)
        elif self.fmt == "cigar":
            self._write_cigar(rp, read, pairflg)
        else:
            raise ValueError(f"unsupported output format {self.fmt}")

    def _write_sam(self, rp: RepAli, read: Read, mp: Optional[RepAli],
                   isize: int, pairflg: int):
        """fprintREPALIsam (report.c:762-906)."""
        qlen = len(read.seq)
        samflg = 0
        s_nam = self.refset.sam_name(rp.s_idx) if (rp.status & REPMATEFLG.MAPPED) else "*"
        ms_nam = "*"
        pos = 0
        mpos = 0
        if rp.status & REPMATEFLG.PAIRED:
            samflg |= SAMFLAG.PAIRED
            if rp.status & REPMATEFLG.MATE2:
                samflg |= SAMFLAG.MATE2
                isize = -isize
            else:
                samflg |= SAMFLAG.MATE1
            if mp is not None and (mp.status & REPMATEFLG.MAPPED):
                mpos = mp.s_start
                ms_nam = self.refset.sam_name(mp.s_idx)
                if mp.status & REPMATEFLG.REVERSE:
                    samflg |= SAMFLAG.MATESTRAND
            else:
                samflg |= SAMFLAG.MATENOMAP
                isize = 0
                mpos = 0
                ms_nam = "*"

        editdist = 0
        swatscor = 0
        clip_start = clip_end = 0
        cigar = "*"
        if rp.status & REPMATEFLG.MAPPED:
            is_rev = bool(rp.status & REPMATEFLG.REVERSE)
            if self.soft_clip:
                qseg = read.seq
                qual = read.qual
            else:
                qseg = read.seq[rp.q_start - 1 : rp.q_end]
                qual = read.qual[rp.q_start - 1 : rp.q_end] if read.qual else None
            if is_rev:
                qseg = codec.revcomp_codes(qseg)
                qual = qual[::-1] if qual else None
                samflg |= SAMFLAG.STRAND
                clip_start = qlen - rp.q_end
                clip_end = rp.q_start - 1
            else:
                clip_start = rp.q_start - 1
                clip_end = qlen - rp.q_end
            seqstr = codec.decode(qseg).decode("ascii")
            qualstr = qual.decode("ascii") if qual else "*"
            pos = rp.s_start
            if (pairflg & REPPAIR.PROPER) and (pairflg & REPPAIR.WITHIN):
                samflg |= SAMFLAG.PROPER
            if rp.status & REPMATEFLG.PARTIAL:
                samflg |= SAMFLAG.NOTPRIMARY
            swatscor = rp.swatscor
            cigar = ds.diffstr_to_cigar(rp.diff, extended=True,
                                        silent_mismatch=not self.x_mismatch,
                                        clip_start=clip_start, clip_end=clip_end,
                                        soft_clip=self.soft_clip)
            editdist = ds.levenshtein(rp.diff)
        else:
            samflg |= SAMFLAG.NOMAP
            s_nam = "*"
            isize = 0
            if self.soft_clip:
                seqstr = codec.decode(read.seq).decode("ascii")
                qualstr = read.qual.decode("ascii") if read.qual else "*"
            else:
                seqstr = "*"
                qualstr = "*"
        if not qualstr:
            qualstr = "*"
        self.fp.write(f"{read.sam_name}\t{samflg}\t{s_nam}\t{pos}\t{rp.mapscor}\t"
                      f"{cigar}\t{ms_nam}\t{mpos}\t{isize}\t{seqstr}\t{qualstr}\t"
                      f"NM:i:{editdist}\tAS:i:{swatscor}\n")

    def _write_cigar(self, rp: RepAli, read: Read, pairflg: int):
        """fprintREPALIcigar (report.c:591-646)."""
        if rp is not None and (rp.status & REPMATEFLG.MAPPED):
            is_rev = bool(rp.status & REPMATEFLG.REVERSE)
            flagchr = "A" if (pairflg & REPPAIR.WITHIN) else ("B" if rp.status & REPMATEFLG.PAIRED else "S")
            # cigar:<flag>:<mapq> qname qs qe strand sname ss se strand score cigar
            if is_rev:
                qs, qe = rp.q_end, rp.q_start
                dirc = "-"
            else:
                qs, qe = rp.q_start, rp.q_end
                dirc = "+"
            cig = ds.diffstr_to_cigar(rp.diff, extended=False,
                                      silent_mismatch=True)
            self.fp.write(
                f"cigar:{flagchr}:{rp.mapscor:02d} {read.sam_name} {qs} {qe} {dirc} "
                f"{self.refset.sam_name(rp.s_idx)} {rp.s_start} {rp.s_end} + "
                f"{rp.swatscor} {cig}\n")
