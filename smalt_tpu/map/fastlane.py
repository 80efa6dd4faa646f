"""Python side of the C fast-lane (native/fastlane.c).

The fast-lane maps a whole block of single-end reads to final SAM text
in one native call, replicating the exact Python path (rmap_single ->
add_single_to_report -> _write_sam) byte-for-byte.  `FastLane.make`
gates on the modes the lane covers; `render_block` returns None on any
native-side error, in which case the caller reruns the block through
the Python engine with the untouched RNG state (the lane commits the
drand48 state only on success).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import rand
from ..align import core as ali_mod
from ..native import get_lib
from ..results import pairs as pairs_mod
from . import engine as eng_mod


class FastLane:
    def __init__(self, engine, soft_clip: bool, x_mismatch: bool):
        lib = get_lib()
        p = engine.params
        refset = engine.refset
        idx = engine.index
        self.lib = lib
        self.engine = engine
        self.soft_clip = soft_clip
        self.x_mismatch = x_mismatch
        # pinned argument buffers
        self._matrix = np.ascontiguousarray(engine.matrix, dtype=np.int32)
        self._ivals = np.ascontiguousarray(engine._seq_ivals, dtype=np.int64)
        snames = []
        offs = [0]
        for s in range(refset.nseq):
            snames.append(refset.sam_name(s).encode())
            offs.append(offs[-1] + len(snames[-1]))
        self._snames = np.frombuffer(b"".join(snames) or b"\0",
                                     dtype=np.uint8).copy()
        self._sname_offs = np.asarray(offs, dtype=np.int64)
        self._offsets = np.ascontiguousarray(refset.offsets, np.int64)
        self._refcodes = np.ascontiguousarray(refset.codes, np.uint8)
        ma, mm = ali_mod.avg_penalties(engine.matrix)
        self._avgs = (ma, mm)
        wa, sa, pa, ta = idx.addrs
        self._idx_addrs = (wa, sa, idx.nwords, ta, pa)
        self._rng_io = np.zeros(1, dtype=np.uint64)

    @classmethod
    def make(cls, engine, fmt: str, soft_clip: bool, x_mismatch: bool,
             ali_out: bool, fix_primary: bool) -> Optional["FastLane"]:
        """Return a lane when the run's modes are covered, else None."""
        lib = get_lib()
        if lib is None or not hasattr(lib, "fl_map_block"):
            return None
        if fmt != "sam" or ali_out or fix_primary:
            return None
        p = engine.params
        need = eng_mod.RMAPFLG_BEST | eng_mod.RMAPFLG_SEQBYSEQ
        block = (eng_mod.RMAPFLG_SPLIT | eng_mod.RMAPFLG_CMPLXW |
                 eng_mod.RMAPFLG_NOSHRTINFO)
        if (p.rmapflg & need) != need or (p.rmapflg & block):
            return None
        if p.use_cplx:
            return None
        return cls(engine, soft_clip, x_mismatch)

    def render_block(self, block) -> Optional[str]:
        """One native call for a block of Read objects."""
        n = len(block)
        read_offs = np.zeros(n + 1, dtype=np.int64)
        name_offs = np.zeros(n + 1, dtype=np.int64)
        has_qual = np.zeros(n, dtype=np.uint8)
        codes_parts = []
        qual_parts = []
        name_parts = []
        qmax = 1
        for i, read in enumerate(block):
            seq = read.seq
            if seq.dtype != np.uint8 or not seq.flags.c_contiguous:
                seq = np.ascontiguousarray(seq, dtype=np.uint8)
            codes_parts.append(seq)
            ql = len(seq)
            qmax = max(qmax, ql)
            if read.qual is not None:
                if len(read.qual) != ql:
                    return None
                qual_parts.append(read.qual)
                has_qual[i] = 1
            else:
                qual_parts.append(b"\x00" * ql)
            nm = read.sam_name.encode()
            name_parts.append(nm)
            read_offs[i + 1] = read_offs[i] + ql
            name_offs[i + 1] = name_offs[i] + len(nm)
        codes = np.concatenate(codes_parts) if codes_parts else \
            np.zeros(1, np.uint8)
        quals = np.frombuffer(b"".join(qual_parts) or b"\0", np.uint8)
        names = np.frombuffer(b"".join(name_parts) or b"\0", np.uint8)
        return self._call(n, qmax, codes, read_offs, quals, has_qual,
                          names, name_offs, ascii_codes=False,
                          names_raw=False)

    def render_raw_block(self, names, seqs, quals) -> Optional[str]:
        """One native call for raw bulk-reader output (bytes lists):
        encode + name-strip happen in C."""
        n = len(names)
        read_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(s) for s in seqs], out=read_offs[1:])
        name_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(x) for x in names], out=name_offs[1:])
        qmax = int((read_offs[1:] - read_offs[:-1]).max()) if n else 1
        has_qual = np.empty(n, dtype=np.uint8)
        qual_parts = []
        for i, q in enumerate(quals):
            if q is not None:
                if len(q) != len(seqs[i]):
                    return None     # malformed record: exact reader decides
                has_qual[i] = 1
                qual_parts.append(q)
            else:
                has_qual[i] = 0
                qual_parts.append(b"\x00" * len(seqs[i]))
        codes = np.frombuffer(b"".join(seqs) or b"\0", np.uint8)
        qarr = np.frombuffer(b"".join(qual_parts) or b"\0", np.uint8)
        narr = np.frombuffer(b"".join(names) or b"\0", np.uint8)
        return self._call(n, max(qmax, 1), codes, read_offs, qarr, has_qual,
                          narr, name_offs, ascii_codes=True, names_raw=True)

    def _call(self, n, qmax, codes, read_offs, quals, has_qual,
              names, name_offs, ascii_codes: bool,
              names_raw: bool) -> Optional[str]:
        p = self.engine.params
        filt = self.engine.filter
        wa, sa, nwords, ta, pa = self._idx_addrs
        idx = self.engine.index
        cap = int(name_offs[-1]) + n * (2 * qmax + 192)
        self._rng_io[0] = rand._global._x
        for _ in range(3):
            out = np.empty(cap, dtype=np.uint8)
            rc = self.lib.fl_map_block(
                wa, sa, nwords, ta, pa, idx.wordlen, idx.nskip,
                self._refcodes.ctypes.data, self._offsets.ctypes.data,
                self.engine.refset.nseq, self._ivals.ctypes.data,
                self._snames.ctypes.data, self._sname_offs.ctypes.data,
                self._matrix.ctypes.data,
                -self.engine.gapopen, -self.engine.gapext,
                self._avgs[0], self._avgs[1],
                p.ktuple_maxhit, eng_mod.HASH_MAXNHITS,
                p.min_cover_frac, p.min_swatscor,
                p.min_swatscor_below_max, p.min_basq,
                p.target_depth, p.max_depth,
                p.rmapflg & ~eng_mod.RMAPFLG_ALLPAIR, p.rsltouflg,
                filt.min_swscor, filt.min_swscor_below_max,
                filt.min_identity,
                1 if self.soft_clip else 0, 1 if self.x_mismatch else 0,
                1 if ascii_codes else 0, 1 if names_raw else 0,
                n, codes.ctypes.data, read_offs.ctypes.data,
                quals.ctypes.data, has_qual.ctypes.data,
                names.ctypes.data, name_offs.ctypes.data,
                self._rng_io.ctypes.data, out.ctypes.data, cap)
            if rc == -3:          # text buffer too small: grow and retry
                cap *= 4
                continue
            if rc < 0:
                return None
            rand._global._x = int(self._rng_io[0])
            return out[:rc].tobytes().decode("ascii")
        return None
