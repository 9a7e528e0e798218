"""Multicolor smoothers: MULTICOLOR_GS, FIXCOLOR_GS, MULTICOLOR_DILU,
MULTICOLOR_ILU.

References: core/src/solvers/multicolor_gauss_seidel_solver.cu,
fixcolor_gauss_seidel_solver.cu, multicolor_dilu_solver.cu (the reference's
workhorse smoother), multicolor_ilu_solver.cu.

TPU re-design: a proper coloring guarantees rows of one color are mutually
independent, so each color step is a masked vector update around one full
SpMV — the color loop is static and traces into the enclosing cycle's XLA
program. Factorizations (DILU E-diagonal, ILU(k)) are setup-phase host work.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Solver, register_solver
from .smoothers import GaussSeidelSolver, _apply_inv_diag
from ..coloring import MatrixColoring
from ..matrix import CSRMatrix, csr_to_ell, mode_dtypes


@register_solver("MULTICOLOR_GS")
class MulticolorGSSolver(GaussSeidelSolver):
    """Color-parallel Gauss-Seidel (multicolor_gauss_seidel_solver.cu)."""


@register_solver("FIXCOLOR_GS")
class FixcolorGSSolver(GaussSeidelSolver):
    """Fixed 4-color Gauss-Seidel (fixcolor_gauss_seidel_solver.cu): colors
    assigned round-robin without a structural coloring — cheap setup, valid
    for structured grids."""

    needs_coloring = False

    def solver_setup(self):
        n = self.m.csr.n_rows
        self.m.coloring = MatrixColoring(
            (np.arange(n) % 4).astype(np.int32), 4, "FIXCOLOR")
        super().solver_setup()


@register_solver("MULTICOLOR_DILU")
class MulticolorDILUSolver(Solver):
    """Multicolor DILU (multicolor_dilu_solver.cu:— the reference's default
    AMG smoother).

    Setup builds the DILU diagonal E with
        E_i = a_ii - sum_{color(j) < color(i)} a_ij E_j^{-1} a_ji
    sequentially over colors (vectorized per color via the Hadamard product
    A .* A^T). The smoothing step applies
        x += omega * (E+L)^{-1} E (E+U)^{-1} (b - A x)
    as two color-sequential sweeps, each color being one masked SpMV update.
    """

    is_smoother = True
    needs_coloring = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.zero_guess_opt = bool(cfg.get("smooth_with_0_initial_guess",
                                           scope))

    def solver_setup(self):
        csr = self.m.csr
        coloring = self.m.coloring
        vec_dt, _ = mode_dtypes(self.mode)
        nc = coloring.num_colors
        bx, by = csr.block_dim
        n = csr.n_rows
        col = coloring.colors
        if (bx, by) == (1, 1):
            A = csr.to_scipy().tocsr()     # external diagonal included
            H = A.multiply(A.T).tocsr()    # h_ij = a_ij * a_ji
            diag = A.diagonal().astype(np.float64)
            E = diag.copy()
            invE = np.zeros(n)
            done = np.zeros(n)             # invE masked to colors < c
            for c in range(nc):
                rows = col == c
                if c > 0:
                    corr = H[rows] @ done
                    E[rows] = diag[rows] - corr
                safe = np.where(E[rows] == 0, 1.0, E[rows])
                invE[rows] = 1.0 / safe
                done[rows] = invE[rows]
            e_pad = np.zeros(self.n_pad)
            ie_pad = np.ones(self.n_pad)
            e_pad[:n], ie_pad[:n] = E, invE
            # one batched put (each eager transfer = a tunnel round trip)
            self.E, self.invE = jax.device_put(
                (e_pad.astype(vec_dt), ie_pad.astype(vec_dt)))
        else:
            # blocked DILU: E_i are bx*bx blocks. Vectorized per color:
            # match entries (i,j) of A with (i,j) of A^T once, then each
            # color's correction sum_j A_ij invE_j A_ji is one batched
            # einsum + segment sum.
            diag = csr.diagonal().astype(np.float64)
            E = diag.copy()
            invE = np.zeros_like(E)
            at = csr.transpose()
            rows_a = np.repeat(np.arange(n), csr.row_nnz())
            rows_t = np.repeat(np.arange(at.n_rows), at.row_nnz())
            in_range = csr.indices < n
            keys_a = rows_a.astype(np.int64) * n + csr.indices
            keys_t = rows_t.astype(np.int64) * n + at.indices
            _, ka, kt = np.intersect1d(
                np.where(in_range, keys_a, -1), keys_t,
                return_indices=True, assume_unique=False)
            ok = keys_a[ka] >= 0
            ka, kt = ka[ok], kt[ok]
            pi, pj = rows_a[ka], csr.indices[ka]        # pair (i, j)
            aij = csr.data[ka].astype(np.float64)
            # at.data[kt] holds (A^T)_ij = (A_ji)^T; transpose back
            aji = np.swapaxes(at.data[kt].astype(np.float64), 1, 2)
            for c in range(nc):
                rows_c = np.nonzero(col == c)[0]
                if c > 0:
                    sel = (col[pi] == c) & (col[pj] < c)
                    if np.any(sel):
                        contrib = np.einsum(
                            "kab,kbc,kcd->kad", aij[sel], invE[pj[sel]],
                            aji[sel])
                        corr = np.zeros((n, bx, bx))
                        np.add.at(corr, pi[sel], contrib)
                        E[rows_c] = diag[rows_c] - corr[rows_c]
                blocks = E[rows_c]
                sing = np.abs(np.linalg.det(blocks)) < \
                    np.finfo(np.float64).tiny
                safe = np.where(sing[:, None, None], np.eye(bx), blocks)
                inv_c = np.linalg.inv(safe)
                inv_c[sing] = np.eye(bx)
                invE[rows_c] = inv_c
            e_pad = np.tile(np.eye(bx), (self.n_pad, 1, 1))
            ie_pad = np.tile(np.eye(bx), (self.n_pad, 1, 1))
            e_pad[:n], ie_pad[:n] = E, invE
            self.E, self.invE = jax.device_put(
                (e_pad.astype(vec_dt), ie_pad.astype(vec_dt)))
        self.num_colors = nc
        color_pad = np.full(self.n_pad, -1, np.int32)
        color_pad[:n] = col
        if bx > 1:
            color_pad = np.repeat(color_pad, bx)
        self.color = jnp.asarray(color_pad)

    def _dilu_apply(self, r):
        """delta = (E+L)^{-1} E (E+U)^{-1}... note order: M = (E+L)E^{-1}(E+U);
        M^{-1} r solves (E+L) z = r then (E+U) delta = E z.

        The color loops run as device fori_loops (not unrolled) so the
        traced program stays small enough to fuse whole V-cycles — see
        GaussSeidelSolver._sweep."""
        import jax
        A = self.op
        nc = self.num_colors

        def fwd(c, z):
            az = A.apply(z)
            upd = _apply_inv_diag(self.invE, r - az)
            return jnp.where(self.color == c, upd, z)

        z = jax.lax.fori_loop(0, nc, fwd, jnp.zeros_like(r))
        w = _apply_inv_diag(self.E, z) if self.E.ndim > 1 else self.E * z

        def bwd(i, x):
            c = nc - 1 - i
            ax = A.apply(x)
            upd = z - _apply_inv_diag(self.invE, ax)
            return jnp.where(self.color == c, upd, x)

        return jax.lax.fori_loop(0, nc, bwd, jnp.zeros_like(r))

    def solve_init(self, b, x, zero_guess):
        return None

    def first_iteration(self, b, x, s, zero_guess):
        if zero_guess and self.zero_guess_opt:
            return self.relaxation_factor * self._dilu_apply(b), None
        return self.solve_iteration(b, x, s)

    def solve_iteration(self, b, x, s):
        r = b - self.op.apply(x)
        x = x + self.relaxation_factor * self._dilu_apply(r)
        return x, None


def ilu0_factor_host(indptr, indices, data, rank, perm):
    """ILU(0) factorization in the given row ordering (rank[i] = position
    of row i; perm = order to process rows). Native C++ kernel when built
    (csrc/amgx_host.cpp ilu0_factor), python IKJ fallback otherwise.
    Returns the factored values array (L multipliers below, U above)."""
    from .. import native
    lib = native.lib()
    if lib is not None:
        return lib.ilu0(indptr, indices, np.asarray(data, np.float64),
                        rank, perm)
    n = len(indptr) - 1
    data = np.asarray(data, np.float64).copy()
    rowmap = [dict() for _ in range(n)]
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            rowmap[i][int(indices[k])] = k
    for i in np.asarray(perm).tolist():
        ri = rank[i]
        # eliminate using rows j with rank[j] < rank[i]
        ks = sorted(rowmap[i].items(), key=lambda kv: rank[kv[0]])
        for j, kij in ks:
            if rank[j] >= ri:
                continue
            dj = rowmap[j].get(j)
            piv = data[dj] if dj is not None else 0.0
            if piv == 0.0:
                continue
            lij = data[kij] / piv
            data[kij] = lij
            for jj, kjj in rowmap[j].items():
                if rank[jj] > rank[j] and jj in rowmap[i]:
                    data[rowmap[i][jj]] -= lij * data[kjj]
    return data


@register_solver("MULTICOLOR_ILU")
class MulticolorILUSolver(Solver):
    """Multicolor ILU(k) smoother (multicolor_ilu_solver.cu). k in {0,1}
    (ilu_sparsity_level; ILU(1) pattern via sparsity_ilu1, reference
    CSR_Multiply::csr_sparsity_ilu1).

    Setup factorizes A ~= L U **in the color ordering** host-side; the color
    classes are exactly the level sets of the triangular solves, so each
    half-solve is num_colors masked SpMV updates on device.
    """

    is_smoother = True
    needs_coloring = True

    def solver_setup(self):
        csr = self.m.csr
        if csr.block_dim != (1, 1):
            # factorize the scalar expansion (the interleaved block-vector
            # layout matches the scalar expansion exactly)
            from ..coloring import color_matrix
            csr = CSRMatrix.from_scipy(self.m.csr.to_scipy())
            coloring = color_matrix(
                csr, self.cfg.get("matrix_coloring_scheme", self.scope),
                self.cfg, self.scope)
        else:
            coloring = self.m.coloring
        vec_dt, _ = mode_dtypes(self.mode)
        level_k = int(self.cfg.get("ilu_sparsity_level", self.scope))
        work = csr
        if level_k >= 1:
            from ..ops.spgemm import sparsity_ilu1
            work = sparsity_ilu1(csr)
        col = coloring.colors
        nc = coloring.num_colors
        n = csr.n_rows
        # order rows by color; factorize in that ordering
        perm = np.argsort(col, kind="stable")      # new ordering -> old row
        rank = np.empty(n, np.int64)
        rank[perm] = np.arange(n)                  # old row -> position
        # host ILU0 on the (possibly ILU(1)-extended) pattern in the color
        # ordering; native C++ kernel when built (csrc/amgx_host.cpp),
        # python IKJ fallback otherwise
        indptr, indices = work.indptr, work.indices
        data = ilu0_factor_host(indptr, indices, work.data, rank, perm)
        # split into L (strict, color-lower) and U (incl diag)
        rows = np.repeat(np.arange(n), np.diff(indptr))
        lower = rank[indices] < rank[rows]
        upper = ~lower
        lmat = CSRMatrix.from_coo(n, n, rows[lower], indices[lower],
                                  data[lower], sum_duplicates=False)
        umat = CSRMatrix.from_coo(n, n, rows[upper], indices[upper],
                                  data[upper], sum_duplicates=False)
        udiag = np.ones(self.vec_len)
        rows_all = np.repeat(np.arange(n), np.diff(indptr))
        dmask = (indices == rows_all) & (data != 0)
        udiag[rows_all[dmask]] = data[dmask]
        self.L = csr_to_ell(lmat, dtype=vec_dt, row_pad=self.vec_len)
        self.U = csr_to_ell(umat, dtype=vec_dt, row_pad=self.vec_len)
        color_pad = np.full(self.vec_len, -1, np.int32)
        color_pad[:n] = col
        self.inv_udiag, self.color = jax.device_put(
            ((1.0 / udiag).astype(vec_dt), color_pad))
        self.num_colors = nc

    def _ilu_apply(self, r):
        # color loops as device fori_loops (program size — see
        # GaussSeidelSolver._sweep)
        import jax
        nc = self.num_colors

        # forward solve (I + L) y = r  (unit lower in color ordering)
        def fwd(c, y):
            return jnp.where(self.color == c, r - self.L.apply(y), y)

        y = jax.lax.fori_loop(0, nc, fwd, jnp.zeros_like(r))

        # backward solve U x = y; U includes the diagonal, but x_c = 0 before
        # its own update so (U x)_c has no diagonal contribution and
        # x_c = inv_udiag_c * (y_c - (U x)_c)
        def bwd(i, x):
            c = nc - 1 - i
            return jnp.where(self.color == c,
                             self.inv_udiag * (y - self.U.apply(x)), x)

        return jax.lax.fori_loop(0, nc, bwd, jnp.zeros_like(r))

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        r = b - self.op.apply(x)
        x = x + self.relaxation_factor * self._ilu_apply(r)
        return x, None
