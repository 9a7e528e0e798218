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
        try:
            self._h.counting_sort_perm.restype = None
            self._h.counting_sort_perm.argtypes = [
                ctypes.c_int64, i64p, ctypes.c_int64, i64p]
            self._has_csort = True
        except AttributeError:
            self._has_csort = False
        try:
            i8p_ = ctypes.POINTER(ctypes.c_int8)
            i16p_ = ctypes.POINTER(ctypes.c_int16)
            self._h.gather_postpack.restype = None
            self._h.gather_postpack.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                i64p, i32p, i32p, i32p, i32p, f64p,
                i64p, i32p, i32p,
                ctypes.c_void_p, i16p_, i8p_]
            self._has_postpack = True
        except AttributeError:
            self._has_postpack = False
        try:
            i8p_ = ctypes.POINTER(ctypes.c_int8)
            i16p_ = ctypes.POINTER(ctypes.c_int16)
            self._h.gather_postpack_en.restype = None
            self._h.gather_postpack_en.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                i64p, i32p, i32p, i32p, i32p, f64p,
                i64p, i32p, i32p,
                ctypes.c_void_p, i16p_, i8p_]
            self._has_postpack_en = True
        except AttributeError:
            self._has_postpack_en = False
        try:
            self._h.gather_prepack.restype = ctypes.c_int64
            self._h.gather_prepack.argtypes = [
                ctypes.c_int64, i64p, i32p, f64p, f64p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                i32p, i32p, i32p, i32p, f64p, i64p]
            self._h.gather_seg_max.restype = None
            self._h.gather_seg_max.argtypes = [ctypes.c_int64, i64p, i32p,
                                               i64p]
            self._h.gather_finish.restype = None
            self._h.gather_finish.argtypes = [
                ctypes.c_int64, i64p, i32p, i64p, ctypes.c_int64,
                i64p, i32p, i64p, i32p]
            self._has_prepack = True
        except AttributeError:
            self._has_prepack = False
        try:
            self._h.pairwise_match.restype = ctypes.c_int64
            self._h.pairwise_match.argtypes = [
                ctypes.c_int64, i64p, i32p, f64p,
                ctypes.c_int64, ctypes.c_double, i64p]
            self._has_pairwise = True
        except AttributeError:
            self._has_pairwise = False
        try:
            self._h.coo_to_csr.restype = ctypes.c_int64
            self._h.coo_to_csr.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p,
                ctypes.c_int64, i64p, i32p, f64p]
            self._has_coo = True
        except AttributeError:
            self._has_coo = False
        try:
            self._h.jp_rounds.restype = None
            self._h.jp_rounds.argtypes = [ctypes.c_int64, i64p, i32p,
                                          i64p, i64p]
            self._has_jp = True
        except AttributeError:
            self._has_jp = False
        try:
            i8p = ctypes.POINTER(ctypes.c_int8)
            self._h.priority_mis.restype = None
            self._h.priority_mis.argtypes = [ctypes.c_int64, i64p, i32p,
                                             i64p, i8p]
            self._has_pmis = True
        except AttributeError:
            self._has_pmis = False
        try:
            self._h.agg_galerkin.restype = ctypes.c_int64
            self._h.agg_galerkin.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i32p, f64p, i64p,
                i64p, i32p, f64p]
            self._has_agg_galerkin = True
        except AttributeError:
            self._has_agg_galerkin = False
        try:
            self._h.rap_nnz.restype = ctypes.c_int64
            self._h.rap_nnz.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64p, i32p, i64p, i32p, i64p, i32p, i64p]
            self._h.rap_fill.restype = None
            self._h.rap_fill.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64p, i32p, f64p, i64p, i32p, f64p, i64p, i32p, f64p,
                i64p, i32p, f64p]
            self._has_rap = True
        except AttributeError:
            self._has_rap = False
        try:
            u8p0 = ctypes.POINTER(ctypes.c_uint8)
            self._h.truncate_keep.restype = None
            self._h.truncate_keep.argtypes = [
                ctypes.c_int64, i64p, f64p, ctypes.c_double,
                ctypes.c_int64, u8p0]
            self._has_truncate = True
        except AttributeError:
            self._has_truncate = False
        try:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            self._h.d2_nnz.restype = ctypes.c_int64
            self._h.d2_nnz.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i32p, u8p, i64p, i64p]
            self._h.d2_fill.restype = None
            self._h.d2_fill.argtypes = [
                ctypes.c_int64, i64p, i32p, f64p, u8p, i64p,
                f64p, f64p, f64p, i64p, i32p, f64p, i64p]
            self._has_d2 = True
        except AttributeError:
            self._has_d2 = False

    def truncate_keep(self, indptr, absv, factor, max_elements):
        """Per-row truncation keep mask (stable top-k + factor filter)."""
        if not self._has_truncate:
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        indptr = np.ascontiguousarray(indptr, np.int64)
        absv = np.ascontiguousarray(absv, np.float64)
        keep = np.zeros(absv.shape[0], np.uint8)
        self._h.truncate_keep(
            len(indptr) - 1, indptr.ctypes.data_as(i64p),
            absv.ctypes.data_as(f64p), float(factor),
            int(max_elements), keep.ctypes.data_as(u8p))
        return keep.astype(bool)

    def d2_interp(self, indptr, indices, data, sel, cf_map, denom,
                  scale_num, diag_safe, nc):
        """Fused distance-2 interpolation (symbolic + numeric + zero-drop
        compaction). Returns (indptr, cols, vals) of P or None."""
        if not self._has_d2:
            return None
        n = len(indptr) - 1
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        data = np.ascontiguousarray(data, np.float64)
        sel = np.ascontiguousarray(sel, np.uint8)
        cf_map = np.ascontiguousarray(cf_map, np.int64)
        denom = np.ascontiguousarray(denom, np.float64)
        scale_num = np.ascontiguousarray(scale_num, np.float64)
        diag_safe = np.ascontiguousarray(diag_safe, np.float64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        p_indptr = np.zeros(n + 1, np.int64)
        nnz = self._h.d2_nnz(
            n, nc, indptr.ctypes.data_as(i64p),
            indices.ctypes.data_as(i32p), sel.ctypes.data_as(u8p),
            cf_map.ctypes.data_as(i64p), p_indptr.ctypes.data_as(i64p))
        p_cols = np.zeros(nnz, np.int32)
        p_vals = np.zeros(nnz, np.float64)
        p_cnt = np.zeros(n, np.int64)
        self._h.d2_fill(
            n, indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i32p),
            data.ctypes.data_as(f64p), sel.ctypes.data_as(u8p),
            cf_map.ctypes.data_as(i64p), denom.ctypes.data_as(f64p),
            scale_num.ctypes.data_as(f64p), diag_safe.ctypes.data_as(f64p),
            p_indptr.ctypes.data_as(i64p), p_cols.ctypes.data_as(i32p),
            p_vals.ctypes.data_as(f64p), p_cnt.ctypes.data_as(i64p))
        # compact the zero-dropped rows
        out_indptr = np.zeros(n + 1, np.int64)
        np.cumsum(p_cnt, out=out_indptr[1:])
        if out_indptr[-1] != nnz:
            new_nnz = int(out_indptr[-1])
            within = np.arange(new_nnz) - np.repeat(out_indptr[:-1], p_cnt)
            take = np.repeat(p_indptr[:-1], p_cnt) + within
            p_cols, p_vals = p_cols[take], p_vals[take]
        return out_indptr, p_cols, p_vals

    def csr_spgemm(self, a, b):
        from .matrix import CSRMatrix
        out_dt = np.result_type(a.data.dtype, b.data.dtype)
        if out_dt not in (np.float32, np.float64):
            return None          # complex products stay on the ESC path
        # f32 inputs run through the f64 kernel (f64 accumulation, cast
        # back below) — the cast is trivial next to the product itself
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
        if out_dt != np.float64:
            cv = cv.astype(out_dt)
        return CSRMatrix(a.n_rows, b.n_cols, ci, cj, cv)

    def galerkin(self, r, a, p):
        out_dt = np.result_type(r.data.dtype, a.data.dtype, p.data.dtype)
        if getattr(self, "_has_rap", False) and \
                out_dt in (np.float32, np.float64):
            from .matrix import CSRMatrix
            ri = np.ascontiguousarray(r.indptr, np.int64)
            rj = np.ascontiguousarray(r.indices, np.int32)
            rv = np.ascontiguousarray(r.data, np.float64)
            ai = np.ascontiguousarray(a.indptr, np.int64)
            aj = np.ascontiguousarray(a.indices, np.int32)
            av = np.ascontiguousarray(a.data, np.float64)
            pi = np.ascontiguousarray(p.indptr, np.int64)
            pj = np.ascontiguousarray(p.indices, np.int32)
            pv = np.ascontiguousarray(p.data, np.float64)
            ci = np.zeros(r.n_rows + 1, np.int64)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f64p = ctypes.POINTER(ctypes.c_double)
            nnz = self._h.rap_nnz(
                r.n_rows, p.n_rows, p.n_cols,
                ri.ctypes.data_as(i64p), rj.ctypes.data_as(i32p),
                ai.ctypes.data_as(i64p), aj.ctypes.data_as(i32p),
                pi.ctypes.data_as(i64p), pj.ctypes.data_as(i32p),
                ci.ctypes.data_as(i64p))
            cj = np.zeros(nnz, np.int32)
            cv = np.zeros(nnz, np.float64)
            self._h.rap_fill(
                r.n_rows, p.n_rows, p.n_cols,
                ri.ctypes.data_as(i64p), rj.ctypes.data_as(i32p),
                rv.ctypes.data_as(f64p),
                ai.ctypes.data_as(i64p), aj.ctypes.data_as(i32p),
                av.ctypes.data_as(f64p),
                pi.ctypes.data_as(i64p), pj.ctypes.data_as(i32p),
                pv.ctypes.data_as(f64p),
                ci.ctypes.data_as(i64p), cj.ctypes.data_as(i32p),
                cv.ctypes.data_as(f64p))
            if out_dt != np.float64:
                cv = cv.astype(out_dt)
            return CSRMatrix(r.n_rows, p.n_cols, ci, cj, cv)
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

    def counting_sort_perm(self, keys, n_keys):
        """Stable O(n) permutation sorting `keys` ascending, or None."""
        if not getattr(self, "_has_csort", False):
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        keys = np.ascontiguousarray(keys, np.int64)
        perm = np.empty(keys.shape[0], np.int64)
        self._h.counting_sort_perm(
            keys.shape[0], keys.ctypes.data_as(i64p), int(n_keys),
            perm.ctypes.data_as(i64p))
        return perm

    def gather_postpack(self, t_tot, b_tot, d, qc, tile_of_edge,
                        row_in_tile, rl, cl, hi_local, vals, gb, rib, q,
                        out_dtype, en_plane: bool = False):
        """Build the G5 device streams (vals_a, hl_a, bmeta) natively;
        returns the three numpy arrays or None when unavailable.
        ``en_plane`` selects the v3 layout: per block [src | EN running
        byte plane] with R = 128 + qc*128 (gather_postpack_en)."""
        if not getattr(self, "_has_postpack_en" if en_plane
                       else "_has_postpack", False):
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i8p = ctypes.POINTER(ctypes.c_int8)
        out_dtype = np.dtype(out_dtype)
        if out_dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
            return None
        nnz = rl.shape[0]
        tile_of_edge = np.ascontiguousarray(tile_of_edge, np.int64)
        row_in_tile = np.ascontiguousarray(row_in_tile, np.int32)
        rl = np.ascontiguousarray(rl, np.int32)
        cl = np.ascontiguousarray(cl, np.int32)
        hi_local = np.ascontiguousarray(hi_local, np.int32)
        vals = np.ascontiguousarray(vals, np.float64)
        gb = np.ascontiguousarray(gb, np.int64)
        rib = np.ascontiguousarray(rib, np.int32)
        q = np.ascontiguousarray(q, np.int32)
        vals_a = np.zeros((t_tot, d, 128), out_dtype)
        hl_a = np.zeros((t_tot, d, 128), np.int16)
        if en_plane:
            r_rows = 128 + qc * 128
            bmeta = np.zeros((b_tot, r_rows, 128), np.int8)
            bmeta[:, 128:, :] = -1        # EN prefill: "no slots yet"
            fn = self._h.gather_postpack_en
        else:
            r_rows = 128 + 2 * qc * 128
            bmeta = np.zeros((b_tot, r_rows, 128), np.int8)
            fn = self._h.gather_postpack
        fn(nnz, int(t_tot), int(b_tot), int(d), int(qc),
           1 if out_dtype == np.dtype(np.float32) else 0,
           tile_of_edge.ctypes.data_as(i64p),
           row_in_tile.ctypes.data_as(i32p),
           rl.ctypes.data_as(i32p), cl.ctypes.data_as(i32p),
           hi_local.ctypes.data_as(i32p), vals.ctypes.data_as(f64p),
           gb.ctypes.data_as(i64p), rib.ctypes.data_as(i32p),
           q.ctypes.data_as(i32p),
           vals_a.ctypes.data_as(ctypes.c_void_p),
           hl_a.ctypes.data_as(i16p), bmeta.ctypes.data_as(i8p))
        return vals_a, hl_a, bmeta

    def gather_prepack(self, n, indptr, indices, data, diag,
                       sp128, w128, n_windows, n_pairs):
        """CSR -> pair-sorted G5 edge streams in one parallel pass.
        Returns (rl, cl, hi, q, vals, pair_cnt, nnz_kept) or None."""
        if not getattr(self, "_has_prepack", False):
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        data = np.ascontiguousarray(data, np.float64)
        cap = data.shape[0] + (n if diag is not None else 0)
        if diag is not None:
            diag = np.ascontiguousarray(diag, np.float64)
        rl = np.empty(cap, np.int32)
        cl = np.empty(cap, np.int32)
        hi = np.empty(cap, np.int32)
        q = np.empty(cap, np.int32)
        vals = np.empty(cap, np.float64)
        pair_cnt = np.zeros(n_pairs, np.int64)
        kept = self._h.gather_prepack(
            int(n), indptr.ctypes.data_as(i64p),
            indices.ctypes.data_as(i32p), data.ctypes.data_as(f64p),
            diag.ctypes.data_as(f64p) if diag is not None
            else ctypes.cast(None, f64p),
            int(sp128), int(w128), int(n_windows), int(n_pairs),
            rl.ctypes.data_as(i32p), cl.ctypes.data_as(i32p),
            hi.ctypes.data_as(i32p), q.ctypes.data_as(i32p),
            vals.ctypes.data_as(f64p), pair_cnt.ctypes.data_as(i64p))
        return (rl[:kept], cl[:kept], hi[:kept], q[:kept], vals[:kept],
                pair_cnt, int(kept))

    def gather_seg_max(self, pair_ptr, s_slot):
        """Per-pair max(slot)+1."""
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        pair_ptr = np.ascontiguousarray(pair_ptr, np.int64)
        s_slot = np.ascontiguousarray(s_slot, np.int32)
        depth = np.empty(len(pair_ptr) - 1, np.int64)
        self._h.gather_seg_max(
            len(pair_ptr) - 1, pair_ptr.ctypes.data_as(i64p),
            s_slot.ctypes.data_as(i32p), depth.ctypes.data_as(i64p))
        return depth

    def gather_finish(self, pair_ptr, s_slot, pair_tile0, d):
        """Edge -> (padded tile id, row-in-tile, block id, row-in-block)."""
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        pair_ptr = np.ascontiguousarray(pair_ptr, np.int64)
        s_slot = np.ascontiguousarray(s_slot, np.int32)
        pair_tile0 = np.ascontiguousarray(pair_tile0, np.int64)
        nnz = s_slot.shape[0]
        tile_of_edge = np.empty(nnz, np.int64)
        row_in_tile = np.empty(nnz, np.int32)
        gb = np.empty(nnz, np.int64)
        rib = np.empty(nnz, np.int32)
        self._h.gather_finish(
            len(pair_ptr) - 1, pair_ptr.ctypes.data_as(i64p),
            s_slot.ctypes.data_as(i32p), pair_tile0.ctypes.data_as(i64p),
            int(d), tile_of_edge.ctypes.data_as(i64p),
            row_in_tile.ctypes.data_as(i32p), gb.ctypes.data_as(i64p),
            rib.ctypes.data_as(i32p))
        return tile_of_edge, row_in_tile, gb, rib

    def jp_rounds(self, indptr, indices, order_desc):
        """Closed-form Jones-Plassmann rounds; returns round_of array."""
        if not self._has_jp:
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = len(indptr) - 1
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        order_desc = np.ascontiguousarray(order_desc, np.int64)
        round_of = np.zeros(n, np.int64)
        self._h.jp_rounds(
            n, indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i32p),
            order_desc.ctypes.data_as(i64p),
            round_of.ctypes.data_as(i64p))
        return round_of

    def priority_mis(self, indptr, indices, order_desc, state):
        """Fixed-priority greedy MIS sweep over a pre-initialized state
        (0 undecided / -1 pre-marked F); mutates and returns state, or
        None when unavailable."""
        if not getattr(self, "_has_pmis", False):
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i8p = ctypes.POINTER(ctypes.c_int8)
        n = len(indptr) - 1
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        order_desc = np.ascontiguousarray(order_desc, np.int64)
        state = np.ascontiguousarray(state, np.int8)
        self._h.priority_mis(
            n, indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i32p),
            order_desc.ctypes.data_as(i64p), state.ctypes.data_as(i8p))
        return state

    def agg_galerkin(self, a, agg, n_coarse):
        """Piecewise-constant Galerkin Ac = P^T A P for an aggregate map
        (scalar entries only). Returns (indptr, indices, data) or None."""
        if not self._has_agg_galerkin or a.nnz == 0 or n_coarse == 0:
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        indptr = np.ascontiguousarray(a.indptr, np.int64)
        indices = np.ascontiguousarray(a.indices, np.int32)
        vals = np.ascontiguousarray(a.data, np.float64)
        aggc = np.ascontiguousarray(agg, np.int64)
        out_indptr = np.zeros(n_coarse + 1, np.int64)
        out_cols = np.zeros(a.nnz, np.int32)
        out_vals = np.zeros(a.nnz, np.float64)
        nnz2 = self._h.agg_galerkin(
            a.n_rows, n_coarse, indptr.ctypes.data_as(i64p),
            indices.ctypes.data_as(i32p), vals.ctypes.data_as(f64p),
            aggc.ctypes.data_as(i64p), out_indptr.ctypes.data_as(i64p),
            out_cols.ctypes.data_as(i32p), out_vals.ctypes.data_as(f64p))
        return out_indptr, out_cols[:nnz2], out_vals[:nnz2]

    def coo_to_csr(self, n_rows, rows, cols, vals, block):
        """COO -> CSR with stable duplicate summing; `vals` is
        (nnz, block) float64. Returns (indptr, indices, data(nnz', block))
        or None when unavailable."""
        if not self._has_coo:
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        nnz = rows.shape[0]
        rows = np.ascontiguousarray(rows, np.int64)
        cols = np.ascontiguousarray(cols, np.int64)
        vals = np.ascontiguousarray(vals, np.float64)
        indptr = np.zeros(n_rows + 1, np.int64)
        out_cols = np.zeros(nnz, np.int32)
        out_vals = np.zeros((nnz, block), np.float64)
        nnz2 = self._h.coo_to_csr(
            n_rows, nnz, rows.ctypes.data_as(i64p),
            cols.ctypes.data_as(i64p), vals.ctypes.data_as(f64p),
            block, indptr.ctypes.data_as(i64p),
            out_cols.ctypes.data_as(i32p), out_vals.ctypes.data_as(f64p))
        return indptr, out_cols[:nnz2], out_vals[:nnz2]

    def pairwise_match(self, indptr, indices, vals, max_iters,
                       max_unassigned):
        """Handshake pairwise matching; `vals` must carry the hash
        tiebreak already (identical partner choice to the numpy path).
        Returns (agg ids, n_aggregates) or None when unavailable."""
        if not self._has_pairwise:
            return None
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        n = len(indptr) - 1
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        vals = np.ascontiguousarray(vals, np.float64)
        agg = np.zeros(n, np.int64)
        n_agg = self._h.pairwise_match(
            n, indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i32p),
            vals.ctypes.data_as(f64p), int(max_iters),
            float(max_unassigned), agg.ctypes.data_as(i64p))
        return agg, int(n_agg)

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
