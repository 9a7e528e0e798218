"""Multigrid cycles: V, W, F, CG (K-cycle), CGF.

Reference: core/src/cycles/fixed_cycle.cu:49-253 and the
V/W/F/CG/CG-flex dispatchers. The recursion is unrolled at trace time over
the static level list, so one outer cycle — pre-smooth, residual, restrict,
child cycles, prolongate+correct, post-smooth — compiles into a single XLA
program including every smoother sweep and the coarse dense solve.
"""

from __future__ import annotations

import jax.numpy as jnp


def _smooth(smoother, b, x, sweeps: int, zero_guess: bool):
    if smoother is None or sweeps <= 0:
        return x
    st = smoother.solve_init(b, x, zero_guess)
    x, st = smoother.first_iteration(b, x, st, zero_guess)
    for _ in range(sweeps - 1):
        x, st = smoother.solve_iteration(b, x, st)
    return x


def _coarse_solve(amg, b):
    lvl = amg.levels[-1]
    if amg.coarse_solver is not None:
        return amg.coarse_solver.as_preconditioner()(b)
    x = jnp.zeros_like(b)
    return _smooth(lvl.smoother, b, x, amg.coarsest_sweeps, True)


def _sweep_counts(amg, idx: int):
    pre, post = amg.presweeps, amg.postsweeps
    if idx == 0 and amg.finest_sweeps != -1:
        # reference: finest_sweeps overrides on the finest level
        # (fixed_cycle.cu getNumFinestsweeps)
        pre = 0 if pre == 0 else amg.finest_sweeps
        post = 0 if post == 0 else amg.finest_sweeps
    elif amg.intensive_smoothing:
        # reference: coarse levels get more sweeps under intensive_smoothing
        pre = max(pre + idx - 1, 0) if pre else 0
        post = max(post + idx - 1, 0) if post else 0
    return pre, post


def cycle(amg, idx: int, b, x, zero_guess: bool = False,
          cycle_type: str = None):
    """Run one cycle at level ``idx`` (pure; reference: FixedCycle::cycle)."""
    ctype = cycle_type or amg.cycle_type
    levels = amg.levels
    if idx == len(levels) - 1:
        if zero_guess:
            return _coarse_solve(amg, b)
        r = b - levels[idx].m.device_op().apply(x)
        return x + _coarse_solve(amg, r)
    lvl = levels[idx]
    pre, post = _sweep_counts(amg, idx)
    x = _smooth(lvl.smoother, b, x, pre, zero_guess)
    if zero_guess and pre == 0:
        r = b
    else:
        r = b - lvl.m.device_op().apply(x)
    rc = lvl.R.apply(r)
    xc = jnp.zeros_like(rc)
    if ctype == "V":
        xc = cycle(amg, idx + 1, rc, xc, True, "V")
    elif ctype == "W":
        xc = cycle(amg, idx + 1, rc, xc, True, "W")
        xc = cycle(amg, idx + 1, rc, xc, False, "W")
    elif ctype == "F":
        # F-cycle: one F-cycle then one V-cycle at each coarse level
        xc = cycle(amg, idx + 1, rc, xc, True, "F")
        xc = cycle(amg, idx + 1, rc, xc, False, "V")
    elif ctype in ("CG", "CGF"):
        xc = _k_cycle(amg, idx + 1, rc, flexible=(ctype == "CGF"))
    else:
        raise ValueError(f"Unknown cycle '{ctype}'")
    e = lvl.P.apply(xc)
    if amg.error_scaling in (2, 3):
        # reference (aggregation_amg_level.cu error scaling):
        #   mode 2: lambda = <r, Ae> / <Ae, Ae>   (residual minimization)
        #   mode 3: lambda = <r, e>  / <e, Ae>    (energy minimization —
        #           over-corrects, the right functional for unsmoothed
        #           aggregation)
        ae = lvl.m.device_op().apply(e)
        if amg.error_scaling == 2:
            num, den = jnp.vdot(r, ae), jnp.vdot(ae, ae)
        else:
            num, den = jnp.vdot(r, e), jnp.vdot(e, ae)
        lam = jnp.where(den != 0, num / jnp.where(den == 0, 1.0, den), 1.0)
        e = lam * e
    x = x + e
    x = _smooth(lvl.smoother, b, x, post, False)
    return x


def _k_cycle(amg, idx: int, b, flexible: bool):
    """CG/CGF cycles (cg_cycle.cu / cg_flex_cycle.cu): Krylov-accelerated
    coarse correction — ``cycle_iters`` steps of (flexible) CG at the coarse
    level, preconditioned by the next-coarser cycle (a K-cycle)."""
    if idx == len(amg.levels) - 1:
        return _coarse_solve(amg, b)
    A = amg.levels[idx].m.device_op()
    x = jnp.zeros_like(b)
    r = b
    z = cycle(amg, idx, r, jnp.zeros_like(r), True, "V")
    p = z
    rz = jnp.vdot(r, z)
    for _ in range(max(1, amg.cycle_iters)):
        q = A.apply(p)
        pq = jnp.vdot(p, q)
        alpha = jnp.where(pq != 0, rz / jnp.where(pq == 0, 1.0, pq), 0.0)
        x = x + alpha * p
        r_new = r - alpha * q
        z_new = cycle(amg, idx, r_new, jnp.zeros_like(r_new), True, "V")
        if flexible:
            beta = jnp.vdot(z_new, r_new - r) / rz
        else:
            beta = jnp.vdot(r_new, z_new) / rz
        rz = jnp.vdot(r_new, z_new)
        p = z_new + beta * p
        r = r_new
    return x
