"""Loader for the native C++ runtime kernels (csrc/).

The setup-phase graph algorithms (SpGEMM, Galerkin product, coloring,
aggregation matching) are irregular host-side work; like the reference's C++
runtime we implement them natively (csrc/amgx_host.cpp, built to
libamgx_host.so) and bind via ctypes. Everything has a pure-numpy fallback so
the library works without the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_so() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (os.path.join(here, "_native", "libamgx_host.so"),
                 os.path.join(here, "..", "csrc", "build",
                              "libamgx_host.so")):
        if os.path.exists(cand):
            return cand
    return None


class _NativeLib:
    """ctypes wrapper exposing CSR kernels with numpy-array marshalling."""

    def __init__(self, path: str):
        self._h = ctypes.CDLL(path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        self._h.spgemm_nnz.restype = ctypes.c_int64
        self._h.spgemm_nnz.argtypes = [
            ctypes.c_int64, ctypes.c_int64,            # n_rows_a, n_cols_b
            i64p, i32p,                                 # A indptr/indices
            i64p, i32p,                                 # B indptr/indices
            i64p]                                       # out C indptr
        self._h.spgemm_fill.restype = None
        self._h.spgemm_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, f64p,
            i64p, i32p, f64p,
            i64p, i32p, f64p]
        self._h.ilu0_factor.restype = None
        self._h.ilu0_factor.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                                        i64p, i64p]
        self._h.greedy_color.restype = ctypes.c_int32
        self._h.greedy_color.argtypes = [ctypes.c_int64, i64p, i32p, i64p,
                                         i32p]
        try:
            self._h.gather_pack.restype = None
            self._h.gather_pack.argtypes = [ctypes.c_int64, i64p, i32p,
                                            i32p, i32p]
            self._has_gather_pack = True
        except AttributeError:
            self._has_gather_pack = False

    def csr_spgemm(self, a, b):
        from .matrix import CSRMatrix
        if a.data.dtype != np.float64 or b.data.dtype != np.float64:
            return None
        ai = np.ascontiguousarray(a.indptr, np.int64)
        aj = np.ascontiguousarray(a.indices, np.int32)
        av = np.ascontiguousarray(a.data, np.float64)
        bi = np.ascontiguousarray(b.indptr, np.int64)
        bj = np.ascontiguousarray(b.indices, np.int32)
        bv = np.ascontiguousarray(b.data, np.float64)
        ci = np.zeros(a.n_rows + 1, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        nnz = self._h.spgemm_nnz(
            a.n_rows, b.n_cols,
            ai.ctypes.data_as(i64p), aj.ctypes.data_as(i32p),
            bi.ctypes.data_as(i64p), bj.ctypes.data_as(i32p),
            ci.ctypes.data_as(i64p))
        cj = np.zeros(nnz, np.int32)
        cv = np.zeros(nnz, np.float64)
        self._h.spgemm_fill(
            a.n_rows, b.n_cols,
            ai.ctypes.data_as(i64p), aj.ctypes.data_as(i32p),
            av.ctypes.data_as(f64p),
            bi.ctypes.data_as(i64p), bj.ctypes.data_as(i32p),
            bv.ctypes.data_as(f64p),
            ci.ctypes.data_as(i64p), cj.ctypes.data_as(i32p),
            cv.ctypes.data_as(f64p))
        return CSRMatrix(a.n_rows, b.n_cols, ci, cj, cv)

    def galerkin(self, r, a, p):
        ra = self.csr_spgemm(r, a)
        if ra is None:
            return None
        return self.csr_spgemm(ra, p)

    def ilu0(self, indptr, indices, data, rank, order):
        """In-place ILU(0) in the given ordering; returns the factored
        values array."""
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        data = np.ascontiguousarray(data, np.float64).copy()
        rank = np.ascontiguousarray(rank, np.int64)
        order = np.ascontiguousarray(order, np.int64)
        self._h.ilu0_factor(
            len(indptr) - 1, indptr.ctypes.data_as(i64p),
            indices.ctypes.data_as(i32p), data.ctypes.data_as(f64p),
            rank.ctypes.data_as(i64p), order.ctypes.data_as(i64p))
        return data

    def gather_pack(self, pair_ptr, rl, cl):
        """Tile-row assignment for the gather-SpMV format; returns the
        per-edge slot array (see csrc gather_pack)."""
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        pair_ptr = np.ascontiguousarray(pair_ptr, np.int64)
        rl = np.ascontiguousarray(rl, np.int32)
        cl = np.ascontiguousarray(cl, np.int32)
        s_out = np.zeros(rl.shape[0], np.int32)
        self._h.gather_pack(
            len(pair_ptr) - 1, pair_ptr.ctypes.data_as(i64p),
            rl.ctypes.data_as(i32p), cl.ctypes.data_as(i32p),
            s_out.ctypes.data_as(i32p))
        return s_out

    def greedy_color(self, indptr, indices, order):
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = len(indptr) - 1
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        order = np.ascontiguousarray(order, np.int64)
        colors = np.zeros(n, np.int32)
        num = self._h.greedy_color(
            n, indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i32p),
            order.ctypes.data_as(i64p),
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return colors, int(num)


def lib() -> Optional[_NativeLib]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = _find_so()
        if path is not None:
            try:
                _LIB = _NativeLib(path)
            except OSError:
                _LIB = None
    return _LIB
