"""Complex -> real system conversions (K1..K4 formulations).

Mirrors the reference's ``complex_conversion`` reader option
(core.cu:381-392; conversion code core/src/readers.cu:244-476): a complex
system A x = b read into a REAL mode is rewritten as an equivalent real
("ERF") system, either

  * modes 1..4  - a scalar system of 2x size,
        A_real = [[K11, K12], [K21, K22]]   (each K built from Re/Im of A)
  * modes 221..224 - a system of the same shape whose entries become 2x2
        real blocks (scalar complex input only, as in readers.cu:850).

K-formulations (readers.cu:286-316 / 508-543):
    K1: [[ Re, -Im], [Im,  Re]]     K2: [[ Re,  Im], [Im, -Re]]
    K3: [[ Im,  Re], [Re, -Im]]     K4: [[ Im, -Re], [Re,  Im]]
rhs embedding: K1/K2 -> (Re b, Im b); K3/K4 -> (Im b, Re b)
sol embedding: K1/K3 -> (Re x, Im x); K2/K4 -> (Re x, -Im x)
(readers.cu:323-366; the scalar modes stack halves, the block modes
interleave per row.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..matrix import CSRMatrix

# (K11, K12, K21, K22) as (source, sign) with source 'r'=Re, 'i'=Im
_K = {
    1: (("r", 1), ("i", -1), ("i", 1), ("r", 1)),
    2: (("r", 1), ("i", 1), ("i", 1), ("r", -1)),
    3: (("i", 1), ("r", 1), ("r", 1), ("i", -1)),
    4: (("i", 1), ("r", -1), ("r", 1), ("i", 1)),
}


def _part(vals: np.ndarray, which: Tuple[str, int]) -> np.ndarray:
    src, sgn = which
    return sgn * (vals.real if src == "r" else vals.imag)


def convert_complex_system(
        m: CSRMatrix, rhs: Optional[np.ndarray],
        sol: Optional[np.ndarray], mode: int
) -> Tuple[CSRMatrix, Optional[np.ndarray], Optional[np.ndarray]]:
    """Convert a complex system to its K-formulation real equivalent.

    ``mode`` follows the reference's ``complex_conversion`` values: 1..4
    for the 2N scalar ERF, 221..224 for the 2x2-block ERF. Returns the
    converted (matrix, rhs, sol); vectors passed as None stay None.
    """
    if m.block_dim != (1, 1):
        # reference: scalar complex input only (readers.cu:850-853 fatal
        # for MatrixMarket; binary block path is unused in practice)
        raise NotImplementedError(
            "complex_conversion supports scalar (1x1-block) complex "
            "systems only")
    if not np.iscomplexobj(m.data):
        raise ValueError("complex_conversion requires a complex system")
    k = mode - 220 if mode > 220 else mode
    if k not in _K:
        raise ValueError(f"complex_conversion={mode} not in 1..4/221..224")
    k11, k12, k21, k22 = _K[k]
    vals = np.asarray(m.data)
    n, nnz = m.n_rows, m.nnz
    indptr = np.asarray(m.indptr)
    indices = np.asarray(m.indices)

    if mode > 220:
        # 2x2-block ERF: same sparsity, each scalar becomes a 2x2 block
        # laid out row-major (readers.cu:508-543)
        data = np.empty((nnz, 2, 2), np.float64)
        data[:, 0, 0] = _part(vals, k11)
        data[:, 0, 1] = _part(vals, k12)
        data[:, 1, 0] = _part(vals, k21)
        data[:, 1, 1] = _part(vals, k22)
        out = CSRMatrix(n, m.n_cols, indptr.copy(), indices.copy(),
                        data, block_dim=(2, 2))

        def embed(v, flip_order, neg_second):
            v = np.asarray(v)
            a, bb = (v.imag, v.real) if flip_order else (v.real, v.imag)
            if neg_second:
                bb = -bb
            return np.stack([a, bb], axis=1).ravel()   # interleaved
    else:
        # scalar 2N ERF: rows 0..n-1 = [K11 | K12], rows n.. = [K21 | K22]
        # (readers.cu:255-276: per-row halves, col shift +n)
        rn = np.diff(indptr)
        new_ptr = np.empty(2 * n + 1, indptr.dtype)
        new_ptr[:n] = 2 * indptr[:-1]
        new_ptr[n:2 * n] = 2 * indptr[:-1] + 2 * nnz
        new_ptr[2 * n] = 4 * nnz
        rows = np.repeat(np.arange(n), rn)
        # per-row layout [cols, cols+n]: scatter positions
        base = 2 * indptr[:-1]                      # row starts, top half
        within = np.arange(nnz) - np.repeat(indptr[:-1], rn)
        p_lo = np.repeat(base, rn) + within         # first-half slots
        p_hi = p_lo + np.repeat(rn, rn)             # second-half slots
        new_idx = np.empty(4 * nnz, indices.dtype)
        new_dat = np.empty(4 * nnz, np.float64)
        for half, (ka, kb) in enumerate(((k11, k12), (k21, k22))):
            off = 2 * nnz * half
            new_idx[off + p_lo] = indices
            new_idx[off + p_hi] = indices + n
            new_dat[off + p_lo] = _part(vals, ka)
            new_dat[off + p_hi] = _part(vals, kb)
        out = CSRMatrix(2 * n, 2 * m.n_cols, new_ptr, new_idx, new_dat)
        del rows

        def embed(v, flip_order, neg_second):
            v = np.asarray(v)
            a, bb = (v.imag, v.real) if flip_order else (v.real, v.imag)
            if neg_second:
                bb = -bb
            return np.concatenate([a, bb])          # stacked halves

    rhs_out = None if rhs is None else embed(rhs, k in (3, 4), False)
    sol_out = None if sol is None else embed(sol, False, k in (2, 4))
    return out, rhs_out, sol_out
