"""Krylov solvers: CG, PCG, PCGF, BiCGSTAB, PBiCGSTAB, GMRES, FGMRES.

References: core/src/solvers/{cg,pcg,pcgf,bicgstab,pbicgstab,gmres,fgmres}
_solver.cu. Each iteration is a pure function over a state dict, so the whole
step (including the AMG preconditioner's cycle) compiles to one XLA program.
GMRES/FGMRES keep a fixed-size Krylov basis (gmres_n_restart) with masked
classical Gram-Schmidt + on-the-fly Givens rotations, materializing x every
iteration so the monitored residual matches the reference's per-iteration
reporting (fgmres_solver.cu:296-605).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Solver, SolverFactory, register_solver


def _identity_precond(r):
    return r


def _safe_div(num, den):
    """num/den with 0 when den == 0: once the residual underflows to exact
    machine zero (unmonitored fixed-iteration runs), the recurrences hit
    0/0 and would poison x with NaN; a zero step keeps the iterate
    stationary instead (the reference exits on its monitor before this can
    happen — here max_iters without monitoring must stay finite too)."""
    safe = jnp.where(den == 0, jnp.ones_like(den), den)
    return jnp.where(den == 0, jnp.zeros_like(num), num / safe)


class _PreconditionedSolver(Solver):
    """Shared plumbing: instantiate + setup the preconditioner scope."""

    uses_preconditioner = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.preconditioner = None
        if self.uses_preconditioner:
            name, _ = cfg.get_pair("preconditioner", scope)
            if name and name != "NOSOLVER":
                self.preconditioner = SolverFactory.allocate(
                    cfg, scope, "preconditioner")

    def solver_setup(self):
        if self.preconditioner is not None:
            target = self.m if self.m is not None else self.op
            if getattr(self, "_resetup_child", False):
                self.preconditioner.resetup(target)
            else:
                self.preconditioner.setup(target)

    def precond(self):
        if self.preconditioner is None:
            return _identity_precond
        return self.preconditioner.as_preconditioner()


@register_solver("PCG")
class PCGSolver(_PreconditionedSolver):
    """Preconditioned conjugate gradients (pcg_solver.cu:132-195)."""

    def solve_init(self, b, x, zero_guess):
        r = b if zero_guess else b - self.op.apply(x)
        M = self.precond()
        z = M(r)
        rho = jnp.vdot(r, z)
        return {"r": r, "p": z, "rho": rho}

    def solve_iteration(self, b, x, s):
        A, M = self.op, self.precond()
        p, r, rho = s["p"], s["r"], s["rho"]
        q = A.apply(p)
        alpha = _safe_div(rho, jnp.vdot(p, q))
        x = x + alpha * p
        r = r - alpha * q
        z = M(r)
        rho_new = jnp.vdot(r, z)
        beta = _safe_div(rho_new, rho)
        p = z + beta * p
        return x, {"r": r, "p": p, "rho": rho_new}


@register_solver("CG")
class CGSolver(PCGSolver):
    """Unpreconditioned CG (cg_solver.cu)."""
    uses_preconditioner = False


@register_solver("PCGF")
class PCGFSolver(_PreconditionedSolver):
    """Flexible PCG with the Polak-Ribiere correction (pcgf_solver.cu)."""

    def solve_init(self, b, x, zero_guess):
        r = b if zero_guess else b - self.op.apply(x)
        z = self.precond()(r)
        return {"r": r, "z": z, "p": z, "rz": jnp.vdot(r, z)}

    def solve_iteration(self, b, x, s):
        A, M = self.op, self.precond()
        p, r, z, rz = s["p"], s["r"], s["z"], s["rz"]
        q = A.apply(p)
        alpha = _safe_div(rz, jnp.vdot(p, q))
        x = x + alpha * p
        r_new = r - alpha * q
        z_new = M(r_new)
        # flexible (Polak-Ribiere): beta = <z_new, r_new - r> / <z, r>
        beta = _safe_div(jnp.vdot(z_new, r_new - r), rz)
        p = z_new + beta * p
        return x, {"r": r_new, "z": z_new, "p": p,
                   "rz": jnp.vdot(r_new, z_new)}


@register_solver("PBICGSTAB")
class PBiCGStabSolver(_PreconditionedSolver):
    """Preconditioned BiCGStab (pbicgstab_solver.cu)."""

    def solve_init(self, b, x, zero_guess):
        r = b if zero_guess else b - self.op.apply(x)
        return {"r": r, "r_star": r, "p": r,
                "rho": jnp.vdot(r, r)}

    def solve_iteration(self, b, x, s):
        A, M = self.op, self.precond()
        r, r_star, p, rho = s["r"], s["r_star"], s["p"], s["rho"]
        p_hat = M(p)
        v = A.apply(p_hat)
        alpha = _safe_div(rho, jnp.vdot(r_star, v))
        sv = r - alpha * v
        s_hat = M(sv)
        t = A.apply(s_hat)
        omega = _safe_div(jnp.vdot(t, sv), jnp.vdot(t, t))
        x = x + alpha * p_hat + omega * s_hat
        r_new = sv - omega * t
        rho_new = jnp.vdot(r_star, r_new)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r_new + beta * (p - omega * v)
        return x, {"r": r_new, "r_star": r_star, "p": p, "rho": rho_new}


@register_solver("BICGSTAB")
class BiCGStabSolver(PBiCGStabSolver):
    """Unpreconditioned BiCGStab (bicgstab_solver.cu)."""
    uses_preconditioner = False


class _GMRESBase(_PreconditionedSolver):
    """Right-preconditioned GMRES with restart; FGMRES is identical except
    the preconditioner may change per iteration (here: always flexible
    storage of Z). The small dense work (Givens, triangular solve) stays in
    jnp so the step fuses into a single XLA program."""

    flexible = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.restart = int(cfg.get("gmres_n_restart", scope))

    def _restart_state(self, b, x):
        m = self.restart
        A = self.op
        r = b - A.apply(x)
        beta = jnp.sqrt(jnp.vdot(r, r).real).astype(
            jnp.real(r).dtype if jnp.iscomplexobj(r) else r.dtype)
        n = r.shape[0]
        V = jnp.zeros((m + 1, n), r.dtype).at[0].set(
            jnp.where(beta > 0, r / jnp.where(beta == 0, 1.0, beta), r))
        Z = jnp.zeros((m, n), r.dtype)
        R = jnp.zeros((m + 1, m), r.dtype)       # triangularized H
        cs = jnp.zeros((m,), r.dtype)
        sn = jnp.zeros((m,), r.dtype)
        g = jnp.zeros((m + 1,), r.dtype).at[0].set(beta)
        return {"V": V, "Z": Z, "R": R, "cs": cs, "sn": sn, "g": g,
                "i": jnp.asarray(0, jnp.int32), "x0": x,
                "nrm": beta}

    def solve_init(self, b, x, zero_guess):
        return self._restart_state(b, x)

    def solve_iteration(self, b, x, s):
        m = self.restart
        A, M = self.op, self.precond()
        V, Z, R, cs, sn, g, i, x0 = (s["V"], s["Z"], s["R"], s["cs"],
                                     s["sn"], s["g"], s["i"], s["x0"])
        vi = V[i]
        z = M(vi)
        w = A.apply(z)
        # classical Gram-Schmidt with one re-orthogonalization, masked to
        # the filled basis rows (j <= i)
        mask = (jnp.arange(m + 1) <= i).astype(w.dtype)
        # conjugating projections (complex-safe; V real -> plain dots)
        h = (jnp.conj(V) @ w) * mask
        w = w - h @ V
        h2 = (jnp.conj(V) @ w) * mask
        w = w - h2 @ V
        h = h + h2
        h_next = jnp.sqrt(jnp.vdot(w, w).real).astype(h.dtype)
        V = V.at[i + 1].set(w / jnp.where(h_next == 0, 1.0, h_next))
        Z = Z.at[i].set(z)
        # apply previous Givens rotations: unitary form
        #   x' =  cs x + sn y,  y' = -conj(sn) x + conj(cs) y
        # which reduces to the classical real rotation for real dtypes
        def apply_rot(j, hcol):
            hj, hj1 = hcol[j], hcol[j + 1]
            c, sj = cs[j], sn[j]
            hcol = hcol.at[j].set(c * hj + sj * hj1)
            hcol = hcol.at[j + 1].set(-jnp.conj(sj) * hj +
                                      jnp.conj(c) * hj1)
            return hcol
        hcol = jax.lax.fori_loop(0, i, apply_rot, h)
        hcol = hcol.at[i + 1].set(h_next)
        hi, hn = hcol[i], hcol[i + 1]
        denom = jnp.sqrt((jnp.conj(hi) * hi + jnp.conj(hn) * hn).real)
        safe = jnp.where(denom == 0, 1.0, denom)
        c_new = jnp.where(denom == 0, 1.0 + 0.0 * hi, jnp.conj(hi) / safe)
        s_new = jnp.where(denom == 0, 0.0 * hi, jnp.conj(hn) / safe)
        hcol = hcol.at[i].set(denom.astype(h.dtype)).at[i + 1].set(0.0)
        cs = cs.at[i].set(c_new)
        sn = sn.at[i].set(s_new)
        gi = g[i]
        g = g.at[i].set(c_new * gi).at[i + 1].set(-jnp.conj(s_new) * gi)
        R = R.at[:, i].set(hcol)
        nrm = jnp.abs(g[i + 1])
        # materialize x: solve R[:k,:k] y = g[:k] (k = i+1) by masked
        # backward substitution over the static bound m
        k = i + 1
        y = jnp.zeros((m,), x.dtype)
        def back_sub(jj, y):
            j = m - 1 - jj
            active = j < k
            rhs = g[j] - R[j] @ y        # plain (non-conjugating) dot
            yj = jnp.where(active, rhs / jnp.where(R[j, j] == 0, 1.0,
                                                   R[j, j]), 0.0)
            return y.at[j].set(yj)
        y = jax.lax.fori_loop(0, m, back_sub, y)
        if self.flexible:
            x_new = x0 + y @ Z
        else:
            x_new = x0 + M(y @ V[:m])
        # restart when the basis is full
        def do_restart(_):
            st = self._restart_state(b, x_new)
            return st
        def keep(_):
            return {"V": V, "Z": Z, "R": R, "cs": cs, "sn": sn, "g": g,
                    "i": i + 1, "x0": x0, "nrm": nrm}
        new_state = jax.lax.cond(i + 1 >= m, do_restart, keep, None)
        # keep reported norm from this iteration even across a restart
        new_state = dict(new_state)
        new_state["nrm"] = nrm
        return x_new, new_state


@register_solver("FGMRES")
class FGMRESSolver(_GMRESBase):
    """Flexible GMRES (fgmres_solver.cu:296-605)."""
    flexible = True


@register_solver("GMRES")
class GMRESSolver(_GMRESBase):
    """GMRES (gmres_solver.cu). Implemented right-preconditioned: with a
    fixed preconditioner this generates the same Krylov space as the
    reference's formulation."""
    flexible = False
