"""Native host-side kernels, built on first import with the system C
compiler (no pip dependencies).  Falls back to None if no compiler is
available — callers must provide pure-Python paths."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "swdp.c")
_SO = os.path.join(_DIR, f"_swdp_{sys.platform}.so")

_lib = None


def _build():
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            _build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.sw_band_fast.restype = ctypes.c_int
    lib.sw_band_fast.argtypes = [i32p, ctypes.c_int, u8p] + [ctypes.c_int] * 8 + [i32p, i32p]
    lib.sw_band_track.restype = ctypes.c_int
    lib.sw_band_track.argtypes = ([i32p, ctypes.c_int, u8p] + [ctypes.c_int] * 9 +
                                  [u8p, ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int), i32p, i32p])
    lib.sw_full.restype = ctypes.c_int
    lib.sw_full.argtypes = [i32p, ctypes.c_int, u8p, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, i32p, i32p]
    lib.nr_sort2.restype = ctypes.c_int
    lib.nr_sort2.argtypes = [u32p, u32p, ctypes.c_int]
    lib.nr_sort2_64_32.restype = ctypes.c_int
    lib.nr_sort2_64_32.argtypes = [u64p, u32p, ctypes.c_int]
    lib.nr_sort64.restype = ctypes.c_int
    lib.nr_sort64.argtypes = [u64p, ctypes.c_int]
    _lib = lib
    return lib


def get_lib():
    return _load()


class _NrSortModule:
    """Adapter exposing sort2 for smalt_tpu.sort_nr."""

    def __init__(self, lib):
        self._lib = lib

    def sort2(self, a: np.ndarray, b: np.ndarray):
        assert a.dtype == np.uint32 and b.dtype == np.uint32
        assert a.flags.c_contiguous and b.flags.c_contiguous
        rc = self._lib.nr_sort2(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(a))
        if rc != 0:
            raise RuntimeError("nr_sort2 stack overflow")


_l = _load()
nrsort = _NrSortModule(_l) if _l is not None else None
