"""Equation scalers (reference: core/src/scalers/ — BINORMALIZATION,
NBINORMALIZATION, DIAGONAL_SYMMETRIC; hooks in Solver::setup/solve,
solver.cu:469-482, 669-676, 851-857).

A scaler rewrites A <- Dl A Dr at setup and transforms b/x around the solve.
Scale vectors are computed host-side once; the per-solve transforms are
elementwise device ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Scaler:
    def setup(self, m) -> None:
        raise NotImplementedError

    def _fit(self, arr, n: int):
        """Pad a scale vector with ones to the caller's (operator-defined)
        padded length."""
        if arr.shape[0] == n:
            return arr
        if arr.shape[0] > n:
            return arr[:n]
        return jnp.concatenate([arr, jnp.ones(n - arr.shape[0],
                                              arr.dtype)])

    def scale_rhs(self, b):
        return self._fit(self._dl_j, b.shape[0]) * b

    def scale_solution_in(self, x):
        return x / self._fit(self._dr_j, x.shape[0])

    def unscale_solution(self, x):
        return self._fit(self._dr_j, x.shape[0]) * x

    def _finalize(self, m, dl: np.ndarray, dr: np.ndarray) -> None:
        """Apply Dl A Dr to the host CSR in place and keep padded device
        copies of the scale vectors. Block (BSR) rows scale uniformly by
        their block-row factor; the vector-space copies are expanded to
        scalar rows so rhs/solution transforms stay elementwise."""
        csr = m.csr
        bx, by = csr.block_dim
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        cols = csr.indices
        in_range = cols < dr.shape[0]
        scale = dl[rows] * np.where(in_range, dr[np.minimum(
            cols, dr.shape[0] - 1)], 1.0)
        dscale = dl * dr
        if (bx, by) != (1, 1):
            scale = scale[:, None, None]
            dscale = dscale[:, None, None]
        csr.data = csr.data * scale
        if csr.diag_data is not None:
            csr.diag_data = csr.diag_data * dscale
        m._device_op = None
        from .ops.blas import pad_to
        dl_s = np.repeat(dl, bx) if bx > 1 else dl
        dr_s = np.repeat(dr, by) if by > 1 else dr
        n_pad = pad_to(csr.n_rows * bx)
        dlp = np.ones(n_pad)
        drp = np.ones(n_pad)
        dlp[:dl_s.shape[0]] = dl_s
        drp[:dr_s.shape[0]] = dr_s
        self._dl = dlp
        self._dr = drp
        self._dl_j = jnp.asarray(dlp)
        self._dr_j = jnp.asarray(drp)


class DiagonalSymmetricScaler(Scaler):
    """Dl = Dr = diag(A)^{-1/2} (scalers/diagonal_symmetric.cu)."""

    def setup(self, m) -> None:
        d = np.abs(m.csr.diagonal()).astype(np.float64)
        if d.ndim > 1:
            d = d[:, 0, 0]
        s = 1.0 / np.sqrt(np.where(d == 0, 1.0, d))
        self._finalize(m, s, s)


class BinormalizationScaler(Scaler):
    """Iterative binormalization: row and column 2-norms driven to one
    (scalers/binormalization.cu)."""

    def __init__(self, iterations: int = 10):
        self.iterations = iterations

    def _compute(self, m):
        import scipy.sparse as sp
        csr = m.csr
        data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
        a2 = sp.csr_matrix((np.abs(data) ** 2, csr.indices, csr.indptr),
                           shape=csr.shape)
        dl = np.ones(csr.n_rows)
        dr = np.ones(csr.n_cols)
        for _ in range(self.iterations):
            r = a2 @ (dr ** 2)
            dl = 1.0 / np.sqrt(np.sqrt(np.where(r == 0, 1.0, r)))
            c = a2.T @ (dl ** 2)
            dr = 1.0 / np.sqrt(np.sqrt(np.where(c == 0, 1.0, c)))
        return dl, (dr[:csr.n_rows] if csr.n_cols >= csr.n_rows else dr)

    def setup(self, m) -> None:
        dl, dr = self._compute(m)
        self._finalize(m, dl, dr)


class NBinormalizationScaler(BinormalizationScaler):
    """Normalized binormalization (scalers/nbinormalization.cu): the same
    fixed point with the scale vectors normalized so their largest entry is
    one — applied before the matrix is rewritten so system and transforms
    stay consistent."""

    def setup(self, m) -> None:
        dl, dr = self._compute(m)
        s = max(dl.max(), dr.max())
        if s > 0:
            dl, dr = dl / s, dr / s
        self._finalize(m, dl, dr)


def make_scaler(name: str, cfg=None, scope: str = "default") -> Scaler:
    iters = cfg.get("scaling_iterations", scope) if cfg is not None else 10
    if name == "DIAGONAL_SYMMETRIC":
        return DiagonalSymmetricScaler()
    if name == "BINORMALIZATION":
        return BinormalizationScaler(iters)
    if name == "NBINORMALIZATION":
        return NBinormalizationScaler(iters)
    raise ValueError(f"Unknown scaler '{name}'")
