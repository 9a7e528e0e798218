"""Pointwise smoothers: BLOCK_JACOBI, JACOBI_L1, GS, CF_JACOBI.

References: core/src/solvers/{block_jacobi,jacobi_l1,gauss_seidel,cf_jacobi}
_solver.cu. All smoothers are expressed as pure masked vector updates around
the SpMV so they fuse into the enclosing cycle's XLA program. The reference's
sequential Gauss-Seidel ordering is replaced by a color-sequential ordering
(computed at setup) — the TPU-idiomatic equivalent; iteration quality matches
multicolor GS.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Solver, register_solver
from ..matrix import mode_dtypes


def _inv_diag_arrays(csr, vec_dtype, n_pad, l1: bool = False):
    """Return the (padded) inverse (block-)diagonal as jnp arrays.

    Scalar: (n_pad,) with 1.0 padding. Blocked: (n_pad, bx, bx) with identity
    padding. l1=True adds the off-diagonal L1 row sums to the diagonal
    (JACOBI_L1, jacobi_l1_solver.cu).
    """
    bx, by = csr.block_dim
    n = csr.n_rows
    host_dt = np.complex128 if np.issubdtype(
        csr.data.dtype, np.complexfloating) else np.float64
    d = csr.diagonal().astype(host_dt)
    if (bx, by) == (1, 1):
        if l1:
            rows = np.repeat(np.arange(n), csr.row_nnz())
            off = csr.indices != rows
            l1sum = np.zeros(n)
            np.add.at(l1sum, rows[off], np.abs(csr.data[off]))
            d = d + l1sum
        inv = np.ones(n_pad, dtype=host_dt)
        safe = np.where(d == 0, 1.0, d)
        inv[:n] = 1.0 / safe
        return jnp.asarray(inv.astype(vec_dtype))
    if l1:
        rows = np.repeat(np.arange(n), csr.row_nnz())
        off = csr.indices != rows
        l1sum = np.zeros((n, bx))
        np.add.at(l1sum, rows[off],
                  np.abs(csr.data[off]).sum(axis=2))
        # add the per-component L1 sums onto the block diagonal
        d = d + np.einsum("ni,ij->nij", l1sum, np.eye(bx))
    inv = np.tile(np.eye(bx, dtype=host_dt), (n_pad, 1, 1))
    # batched inverse on the (n, bx, bx) stack; singular blocks fall back
    # to identity (reference clamps zero pivots, block_jacobi_solver.cu)
    sing = ~np.isfinite(np.linalg.cond(d)) | \
        (np.abs(np.linalg.det(d)) < np.finfo(np.float64).tiny)
    dd = np.where(sing[:, None, None], np.eye(bx), d)
    inv[:n] = np.linalg.inv(dd)
    inv[:n][sing] = np.eye(bx)
    return jnp.asarray(inv.astype(vec_dtype))


def _apply_inv_diag(invd, r):
    if invd.ndim == 1:
        return invd * r
    bx = invd.shape[1]
    rb = r.reshape(-1, bx)
    return jnp.einsum("nij,nj->ni", invd, rb).reshape(-1)


@register_solver("BLOCK_JACOBI")
class BlockJacobiSolver(Solver):
    """(Block-)Jacobi: x += omega * D^{-1} (b - A x)
    (block_jacobi_solver.cu:835-1530)."""

    is_smoother = True
    l1_scaling = False

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.zero_guess_opt = bool(cfg.get("smooth_with_0_initial_guess",
                                           scope))

    def solver_setup(self):
        if self.m is None or self.m.csr is None:
            raise ValueError(f"{type(self).__name__} needs a host CSR matrix")
        vec_dt, _ = mode_dtypes(self.mode)
        self.inv_diag = _inv_diag_arrays(self.m.csr, vec_dt, self.n_pad,
                                         l1=self.l1_scaling)

    def solve_init(self, b, x, zero_guess):
        return None

    def first_iteration(self, b, x, s, zero_guess):
        if zero_guess and self.zero_guess_opt:
            # skip the initial SpMV: r == b when x == 0
            return self.relaxation_factor * _apply_inv_diag(
                self.inv_diag, b), None
        return self.solve_iteration(b, x, s)

    def solve_iteration(self, b, x, s):
        r = b - self.op.apply(x)
        x = x + self.relaxation_factor * _apply_inv_diag(self.inv_diag, r)
        return x, None


@register_solver("JACOBI_L1")
class JacobiL1Solver(BlockJacobiSolver):
    """L1-Jacobi: diagonal strengthened by off-diagonal L1 row sums
    (jacobi_l1_solver.cu)."""
    l1_scaling = True


@register_solver("TWO_STAGE_GS")
class TwoStageGSSolver(Solver):
    """Two-stage Gauss-Seidel (TPU-first extension; Boman et al.,
    arXiv:2104.01196): the GS triangular solve (D+L) z = r is itself
    approximated by ``gs_inner_sweeps`` Jacobi iterations
        z <- D^{-1} (r - L z),   z_0 = D^{-1} r,
    so GS-quality smoothing runs as pure SpMV + axpy — no coloring, no
    sequential-in-color chains, full memory bandwidth on TPU.
    ``symmetric_GS=1`` adds the matching upper-triangular stage."""

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.inner = max(1, int(cfg.get("gs_inner_sweeps", scope)))
        self.symmetric = bool(cfg.get("symmetric_GS", scope))

    def solver_setup(self):
        if self.m is None or self.m.csr is None:
            raise ValueError("TWO_STAGE_GS needs a host CSR matrix")
        vec_dt, _ = mode_dtypes(self.mode)
        csr = self.m.csr
        self.inv_diag = _inv_diag_arrays(csr, vec_dt, self.n_pad)
        n = csr.n_rows
        rows = np.repeat(np.arange(n), csr.row_nnz())
        cols = csr.indices.astype(np.int64)
        # strictly-lower / strictly-upper device operators via the same
        # layout ladder as the system matrix (DIA on stencils)
        from ..matrix import CSRMatrix, Matrix
        bx, by = csr.block_dim
        data = csr.data

        def tri(keep):
            t = CSRMatrix.from_coo(n, csr.n_cols, rows[keep], cols[keep],
                                   data[keep], block_dim=(bx, by),
                                   sum_duplicates=False)
            return Matrix(t, mode=self.mode).device_op()

        self.lower = tri(cols < rows)
        self.upper = tri(cols > rows) if self.symmetric else None

    def solve_init(self, b, x, zero_guess):
        return None

    def _stage(self, r, tri_op):
        z = _apply_inv_diag(self.inv_diag, r)
        for _ in range(self.inner):
            z = _apply_inv_diag(self.inv_diag, r - tri_op.apply(z))
        return z

    def solve_iteration(self, b, x, s):
        r = b - self.op.apply(x)
        x = x + self.relaxation_factor * self._stage(r, self.lower)
        if self.upper is not None:
            r = b - self.op.apply(x)
            x = x + self.relaxation_factor * self._stage(r, self.upper)
        return x, None


@register_solver("GS")
class GaussSeidelSolver(Solver):
    """Gauss-Seidel (gauss_seidel_solver.cu). TPU-native: color-sequential
    sweeps — rows within a color update simultaneously using the freshest
    values of other colors (equivalent to GS under the color ordering).
    GS_L1_variant strengthens the diagonal as in JACOBI_L1;
    symmetric_GS adds a reverse-order sweep."""

    is_smoother = True
    needs_coloring = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.l1 = bool(cfg.get("GS_L1_variant", scope))
        self.symmetric = bool(cfg.get("symmetric_GS", scope))
        self.max_colors = int(cfg.get("gs_max_colors", scope) or 0)

    def solver_setup(self):
        vec_dt, _ = mode_dtypes(self.mode)
        csr = self.m.csr
        self.inv_diag = _inv_diag_arrays(csr, vec_dt, self.n_pad, l1=self.l1)
        coloring = self.m.coloring
        self.num_colors = coloring.num_colors
        color = np.full(self.n_pad, -1, np.int32)
        color[:csr.n_rows] = coloring.colors
        if self.max_colors and self.num_colors > self.max_colors:
            # merged super-colors: every SpMV-per-color sweep is capped;
            # rows sharing a super-color update Jacobi-style (the
            # FIXCOLOR_GS approximation — dense coarse operators can
            # need 30-90 exact colors)
            color[:csr.n_rows] = color[:csr.n_rows] % self.max_colors
            self.num_colors = self.max_colors
        bx = csr.block_dim[0]
        if bx > 1:
            color = np.repeat(color, bx)
        self.color = jnp.asarray(color)

    def _sweep(self, b, x, reverse: bool = False):
        # the color loop runs as a device fori_loop, NOT unrolled: an
        # unrolled loop inlines one full SpMV per color into the trace,
        # and with ~10 colors x pre/post sweeps x AMG levels the fused
        # V-cycle program grew past what the (remote) TPU compiler
        # tolerates (the round-3 "fused GS faults at >=32^3" issue) —
        # and even non-fused, per-level 10x traced SpMVs made dispatch
        # pathological. Identical arithmetic, ~10x smaller program.
        omega = self.relaxation_factor
        nc = self.num_colors

        def body(i, xx):
            c = (nc - 1 - i) if reverse else i
            r = b - self.op.apply(xx)
            upd = omega * _apply_inv_diag(self.inv_diag, r)
            return jnp.where(self.color == c, xx + upd, xx)

        import jax
        return jax.lax.fori_loop(0, nc, body, x)

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        x = self._sweep(b, x)
        if self.symmetric:
            x = self._sweep(b, x, reverse=True)
        return x, None


@register_solver("CF_JACOBI")
class CFJacobiSolver(Solver):
    """C/F-ordered Jacobi (cf_jacobi_solver.cu): smooth coarse points, then
    fine points (mode selects the order / number of half-sweeps via
    cf_smoothing_mode). The C/F split comes from the classical AMG level
    (stashed in csr.aux['cf_map']); without one it degrades to plain
    Jacobi."""

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.cf_mode = int(cfg.get("cf_smoothing_mode", scope))

    def solver_setup(self):
        vec_dt, _ = mode_dtypes(self.mode)
        csr = self.m.csr
        self.inv_diag = _inv_diag_arrays(csr, vec_dt, self.n_pad)
        cf = csr.aux.get("cf_map")
        mask = np.zeros(self.n_pad, dtype=bool)
        if cf is not None:
            mask[:csr.n_rows] = np.asarray(cf) >= 0   # True = C point
        else:
            mask[:csr.n_rows] = True
        bx = csr.block_dim[0]
        if bx > 1:
            mask = np.repeat(mask, bx)
        self.c_mask = jnp.asarray(mask)
        self.has_cf = cf is not None

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        omega = self.relaxation_factor

        def half(x, mask):
            r = b - self.op.apply(x)
            return jnp.where(mask, x + omega *
                             _apply_inv_diag(self.inv_diag, r), x)

        if not self.has_cf:
            r = b - self.op.apply(x)
            return x + omega * _apply_inv_diag(self.inv_diag, r), None
        # modes: 0 CF, 1 FC, 2 CFC, 3 FCF (cf_jacobi_solver.cu)
        seq = {0: "CF", 1: "FC", 2: "CFC", 3: "FCF"}[self.cf_mode]
        for ch in seq:
            x = half(x, self.c_mask if ch == "C" else ~self.c_mask)
        return x, None
