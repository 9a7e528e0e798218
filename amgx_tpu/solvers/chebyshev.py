"""Chebyshev solvers: CHEBYSHEV (Krylov-style accelerator, cheb_solver.cu)
and CHEBYSHEV_POLY (fixed-order polynomial smoother, chebyshev_poly.cu).

Chebyshev smoothing is the TPU-recommended workhorse: it needs only SpMV +
axpy (no colors, no gathers beyond the SpMV), so it runs at memory bandwidth.
The survey (SURVEY.md §7.1) recommends it as the performance smoother; the
reference itself ships V-cheby configs (core/configs/V-cheby*.json).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Solver, register_solver
from .krylov import _PreconditionedSolver
from .smoothers import _inv_diag_arrays, _apply_inv_diag
from ..matrix import mode_dtypes


def _power_lambda_max(apply_fn, n, dtype, iters: int = 10,
                      seed: int = 1234, operand=None) -> float:
    """Power iteration estimate of the largest eigenvalue (reference:
    cheb_solver.cu chebyshev_lambda_estimate_mode 0/1).

    Runs as ONE jitted fori_loop with a single scalar fetch: the eager
    per-iteration form cost 2 host fetches + unjitted op dispatches per
    step, which through the remote tunnel made a 5-level Chebyshev AMG
    setup take ~40 s (chip-measured, round 5). When ``operand`` is given,
    ``apply_fn(operand, v)`` is used and the operator arrays ride as jit
    operands (no multi-MB constants in the HLO, and the persistent cache
    can reuse the program across setups/processes)."""
    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.dtype(dtype)
                                                   if dtype != jnp.bfloat16
                                                   else np.float32))

    def go(opnd, v):
        rdt = jnp.real(v).dtype
        v = v / jnp.sqrt(jnp.real(jnp.vdot(v, v)))

        def body(_, carry):
            v, lam = carry
            w = apply_fn(opnd, v) if opnd is not None else apply_fn(v)
            lam = jnp.real(jnp.vdot(v, w)).astype(rdt)
            nw = jnp.sqrt(jnp.real(jnp.vdot(w, w)))
            v = jnp.where(nw == 0, v, w / jnp.maximum(nw, 1e-30))
            return v, lam

        _, lam = jax.lax.fori_loop(0, iters, body,
                                   (v, jnp.asarray(1.0, rdt)))
        return lam

    if operand is not None:
        lam = float(jax.jit(go)(operand, v0))
    else:
        lam = float(jax.jit(lambda v: go(None, v))(v0))
    return abs(lam) if lam != 0 else 1.0


@register_solver("CHEBYSHEV")
class ChebyshevSolver(_PreconditionedSolver):
    """Preconditioned Chebyshev iteration (cheb_solver.cu:—).

    lambda estimate modes (chebyshev_lambda_estimate_mode):
      0 — power iteration on D^{-1} A (then [lmax/cheb ratio, lmax]),
      1 — power iteration on A,
      2 — user-provided cheby_max_lambda / cheby_min_lambda.
    """

    _jacobi_invd = None

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.est_mode = int(cfg.get("chebyshev_lambda_estimate_mode", scope))
        self.user_max = float(cfg.get("cheby_max_lambda", scope))
        self.user_min = float(cfg.get("cheby_min_lambda", scope))
        self.est_iters = int(cfg.get("chebyshev_eigenvalue_maxits", scope))

    def solver_setup(self):
        super().solver_setup()
        vec_dt, _ = mode_dtypes(self.mode)
        n = self.vec_len
        self._jacobi_invd = None
        if self.est_mode == 2:
            lmax, lmin = self.user_max, self.user_min
        else:
            if self.est_mode == 0 and self.m is not None \
                    and self.m.csr is not None:
                # mode 0 bounds the spectrum of D^-1 A; the iteration must
                # run on the SAME operator (reference: the lambda estimate
                # always matches the iterated operator, cheb_solver.cu:
                # 100-260) — so an unpreconditioned Chebyshev becomes
                # Jacobi-preconditioned here
                invd = _inv_diag_arrays(self.m.csr, vec_dt, self.n_pad)
                fn = lambda t, v: _apply_inv_diag(t[0], t[1].apply(v))
                opnd = (invd, self.op)
                if self.preconditioner is None:
                    self._jacobi_invd = invd
            else:
                fn = lambda t, v: t.apply(v)
                opnd = self.op
            lmax = _power_lambda_max(fn, n, vec_dt, self.est_iters,
                                     operand=opnd)
            lmax *= 1.05                     # safety margin
            lmin = lmax * (self.user_min / max(self.user_max, 1e-30))
        # device scalars so the bounds ride in the fused program's operand
        # pytree (Solver._device_state) — a resetup with a shifted spectrum
        # reuses the compiled program with fresh bounds
        self.lmax, self.lmin = jax.device_put(
            (float(lmax), float(lmin)))

    def solve_init(self, b, x, zero_guess):
        r = b if zero_guess else b - self.op.apply(x)
        d = (self.lmax + self.lmin) / 2.0
        c = (self.lmax - self.lmin) / 2.0
        return {"r": r, "p": jnp.zeros_like(r),
                "alpha": jnp.asarray(0.0, r.dtype),
                "iter": jnp.asarray(0, jnp.int32),
                "d": d, "c": c}

    def solve_iteration(self, b, x, s):
        M = self.precond()
        r, p, alpha, it = s["r"], s["p"], s["alpha"], s["iter"]
        d, c = s["d"], s["c"]
        z = M(r)
        if self._jacobi_invd is not None:
            z = _apply_inv_diag(self._jacobi_invd, z)
        beta0 = jnp.asarray(0.0, r.dtype)
        beta1 = jnp.asarray(0.5 * (c / d) ** 2, r.dtype)
        alpha_new = jnp.where(
            it == 0, 1.0 / d,
            jnp.where(it == 1, 1.0 / (d - c * c / (2.0 * d)),
                      1.0 / (d - alpha * c * c / 4.0)))
        beta = jnp.where(it == 0, beta0,
                         jnp.where(it == 1, beta1,
                                   (alpha * c / 2.0) ** 2))
        p = z + beta * p
        x = x + alpha_new * p
        r = r - alpha_new * self.op.apply(p)
        return x, {"r": r, "p": p, "alpha": alpha_new, "iter": it + 1,
                   "d": d, "c": c}


@register_solver("CHEBYSHEV_POLY")
class ChebyshevPolySolver(Solver):
    """Fixed-order Chebyshev polynomial smoother in D^{-1}A
    (chebyshev_poly.cu, order = chebyshev_polynomial_order 0..10)."""

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.order = int(cfg.get("chebyshev_polynomial_order", scope))
        self.est_iters = int(cfg.get("chebyshev_eigenvalue_maxits", scope))
        self.user_max = float(cfg.get("cheby_max_lambda", scope))
        self.user_min = float(cfg.get("cheby_min_lambda", scope))

    def solver_setup(self):
        vec_dt, _ = mode_dtypes(self.mode)
        self.inv_diag = _inv_diag_arrays(self.m.csr, vec_dt, self.n_pad)
        fn = lambda t, v: _apply_inv_diag(t[0], t[1].apply(v))
        lmax = 1.05 * _power_lambda_max(fn, self.vec_len, vec_dt,
                                        self.est_iters,
                                        operand=(self.inv_diag, self.op))
        ratio = self.user_min / max(self.user_max, 1e-30)
        self.lmax, self.lmin = jax.device_put(
            (float(lmax), float(lmax) * ratio))

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        d = (self.lmax + self.lmin) / 2.0
        c = (self.lmax - self.lmin) / 2.0
        invd = self.inv_diag
        A = self.op
        r = b - A.apply(x)
        z = _apply_inv_diag(invd, r)
        p = z / d
        x = x + p
        alpha = d
        for k in range(1, self.order + 1):
            r = b - A.apply(x)
            z = _apply_inv_diag(invd, r)
            if k == 1:
                alpha_new = d - c * c / (2.0 * d)
            else:
                alpha_new = d - c * c / (4.0 * alpha)
            beta = (jnp.asarray(c, x.dtype) / 2.0) ** 2 / (alpha * alpha_new) \
                if k > 1 else 0.5 * (c / d) ** 2
            p = z / alpha_new + beta * p
            x = x + p
            alpha = alpha_new
        return x, None
