"""Solver base class and factory.

Re-design of the reference's Solver<TConfig> (base/include/solvers/solver.h:
44-325, base/src/solvers/solver.cu:341-1000) for the JAX execution model:

  * ``solve_init`` / ``solve_iteration`` are *pure* functions over a state
    pytree, so one outer iteration jits into a single XLA computation (the
    preconditioner's cycles trace inline).
  * The outer loop runs host-side exactly like the reference's
    Solver::solve (residual monitoring, convergence criterion, residual
    history, per-iteration printing).
  * ``as_preconditioner`` returns a pure ``z = M^{-1} r`` closure — the
    TPU-native analog of calling preconditioner->solve(r, z, true).

Factory registration mirrors SolverFactory<T>::allocate (amg_solver.cu:59):
names are the reference's registry names (core.cu:612-641) so reference JSON
configs run unchanged.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import AMGConfig
from ..convergence import make_convergence
from ..matrix import Matrix, mode_dtypes
from ..ops import blas


class SolveStatus:
    SUCCESS = 0
    FAILED = 1
    DIVERGED = 2
    NOT_CONVERGED = 3

    _NAMES = {0: "success", 1: "failed", 2: "diverged", 3: "not_converged"}

    @classmethod
    def name(cls, s: int) -> str:
        return cls._NAMES.get(s, "unknown")


class Solver:
    """Base solver. Subclasses implement solver_setup() and the pure
    solve_init/solve_iteration pair."""

    # subclasses needing a matrix coloring set this (reference:
    # Solver::setup colors the matrix when the smoother requires it,
    # solver.cu:433)
    needs_coloring = False
    is_smoother = False

    def __init__(self, cfg: AMGConfig, scope: str = "default"):
        self.cfg = cfg
        self.scope = scope
        g = lambda name: cfg.get(name, scope)
        self.max_iters = g("max_iters")
        self.min_iters = g("min_iters")
        self.monitor_residual = bool(g("monitor_residual"))
        self.store_res_history = bool(g("store_res_history")) or \
            self.monitor_residual
        self.print_solve_stats = bool(g("print_solve_stats"))
        self.obtain_timings = bool(g("obtain_timings"))
        self.norm = g("norm")
        self.use_scalar_norm = bool(g("use_scalar_norm"))
        self.relaxation_factor = g("relaxation_factor")
        self.mode = g("mode")
        self.convergence = make_convergence(cfg, scope)
        self.tolerance = g("tolerance")

        self.m: Optional[Matrix] = None          # attached Matrix handle
        self.op = None                            # device operator
        self.res_history: list = []
        self.setup_time = 0.0
        self.solve_time = 0.0
        self.last_iters = 0
        self._jit_iteration = None
        self._jit_first = None
        self.scaler = None

    # -- setup ----------------------------------------------------------------

    def setup(self, m) -> None:
        """Attach the system matrix and build internal state (reference:
        Solver::setup, solver.cu:341)."""
        t0 = time.perf_counter()
        if isinstance(m, Matrix):
            self.m = m
            if self.needs_coloring and m.coloring is None \
                    and m.csr is not None:
                from ..coloring import color_matrix
                m.coloring = color_matrix(
                    m.csr, self.cfg.get("matrix_coloring_scheme", self.scope),
                    self.cfg, self.scope)
            scaling = self.cfg.get("scaling", self.scope)
            if scaling != "NONE":
                from ..scalers import make_scaler
                self.scaler = make_scaler(scaling, self.cfg, self.scope)
                self.scaler.setup(m)
            self.op = m.device_op(
                dense_threshold=self.cfg.get("dense_threshold_rows",
                                             self.scope))
        else:
            self.m = None
            self.op = m
        self.solver_setup()
        self._jit_iteration = None
        self._jit_first = None
        self.setup_time = time.perf_counter() - t0

    def resetup(self, m=None) -> None:
        """Reference: AMGX_solver_resetup — values changed, structure kept.
        Subclasses that can reuse structure override this."""
        self.setup(m if m is not None else self.m)

    def solver_setup(self) -> None:
        """Subclass hook: build factorizations, hierarchies, etc."""

    # -- pure iteration protocol ------------------------------------------------

    def solve_init(self, b, x, zero_guess: bool) -> Any:
        """Build the per-solve state pytree (pure). ``zero_guess`` is a
        *static* Python bool — it selects the traced program, it is never
        part of the state."""
        return None

    def solve_iteration(self, b, x, state) -> Tuple[Any, Any]:
        """One iteration: returns (new_x, new_state). Pure."""
        raise NotImplementedError

    def first_iteration(self, b, x, state, zero_guess: bool):
        """First iteration with static zero-guess knowledge; smoothers
        override to skip the initial SpMV (smooth_with_0_initial_guess)."""
        return self.solve_iteration(b, x, state)

    # -- vector plumbing ---------------------------------------------------------

    @property
    def n_pad(self) -> int:
        op = self.op
        return getattr(op, "n_pad", None) or _dense_pad(op)

    @property
    def block_dim(self) -> Tuple[int, int]:
        return getattr(self.op, "block_dim", (1, 1))

    @property
    def vec_len(self) -> int:
        return self.n_pad * self.block_dim[0]

    def prepare_vector(self, v) -> jnp.ndarray:
        vec_dt, _ = mode_dtypes(self.mode)
        v = jnp.asarray(np.asarray(v).reshape(-1), dtype=vec_dt)
        return blas.pad_vector(v, self.vec_len)

    def extract_vector(self, v) -> np.ndarray:
        n = self.op.n_rows * self.block_dim[0]
        return np.asarray(v)[:n]

    # -- the outer solve loop -----------------------------------------------------

    def solve(self, b, x=None, zero_initial_guess: bool = False):
        """Reference: Solver::solve (solver.cu:589-858). Returns
        (x_device, status)."""
        t0 = time.perf_counter()
        b = self.prepare_vector(b)
        if x is None:
            x = jnp.zeros_like(b)
            zero_initial_guess = True
        else:
            x = self.prepare_vector(x)
        if self.scaler is not None:
            b = self.scaler.scale_rhs(b)
            x = self.scaler.scale_solution_in(x)

        bd = self.block_dim[0]
        norm_of = lambda r: blas.get_norm(
            r, self.norm, bd, self.use_scalar_norm or bd == 1)

        if self._jit_iteration is None:
            self._jit_iteration = jax.jit(
                lambda b_, x_, s_: self.solve_iteration(b_, x_, s_))
            # two first-iteration programs: zero guess / warm start
            self._jit_first = {
                zg: jax.jit(lambda b_, x_, zg=zg: self.first_iteration(
                    b_, x_, self.solve_init(b_, x_, zg), zg))
                for zg in (False, True)}
        zg = bool(zero_initial_guess)

        self.res_history = []
        status = SolveStatus.NOT_CONVERGED
        done = False
        if self.monitor_residual:
            r0 = b - self.op.apply(x) if not zero_initial_guess else b
            ini = np.asarray(norm_of(r0))
            self.convergence.init(ini)
            self.res_history.append(ini)
            if self.print_solve_stats:
                self._print_header()
                self._print_iter("Ini", ini)
            if self.convergence.converged(ini) and self.min_iters == 0:
                done, status = True, SolveStatus.SUCCESS

        it = 0
        state = None
        while not done and it < self.max_iters:
            if it == 0:
                x, state = self._jit_first[zg](b, x)
            else:
                x, state = self._jit_iteration(b, x, state)
            it += 1
            if self.monitor_residual:
                if (isinstance(state, dict) and "nrm" in state
                        and self.norm == "L2"
                        and (self.use_scalar_norm or bd == 1)):
                    # solvers (GMRES family) that track the L2 residual norm
                    # implicitly expose it as state["nrm"]
                    nrm = np.asarray(state["nrm"])
                else:
                    r = state.get("r") if isinstance(state, dict) else None
                    if r is None:
                        r = b - self.op.apply(x)
                    nrm = np.asarray(norm_of(r))
                self.res_history.append(nrm)
                if self.print_solve_stats:
                    self._print_iter(it, nrm)
                if not np.all(np.isfinite(nrm)):
                    status, done = SolveStatus.DIVERGED, True
                elif self.convergence.converged(nrm) and it >= self.min_iters:
                    status, done = SolveStatus.SUCCESS, True
        if not self.monitor_residual:
            status = SolveStatus.SUCCESS
        self.last_iters = it

        if self.scaler is not None:
            x = self.scaler.unscale_solution(x)
        x.block_until_ready()
        self.solve_time = time.perf_counter() - t0
        if self.print_solve_stats:
            self._print_footer(status, it)
        return x, status

    # -- preconditioner protocol ----------------------------------------------------

    def as_preconditioner(self) -> Callable:
        """Pure z = M^{-1} r running ``max_iters`` unmonitored iterations from
        a zero guess (reference: preconditioner->solve(r, z, true))."""
        def apply(r):
            z = jnp.zeros_like(r)
            state = self.solve_init(r, z, True)
            z, state = self.first_iteration(r, z, state, True)
            for _ in range(self.max_iters - 1):
                z, state = self.solve_iteration(r, z, state)
            return z
        return apply

    # -- printing (reference: Solver::print_* solver.cu:722-832) ----------------------

    def _print_header(self):
        print(f"{'iter':>10s} {'Mem Usage (GB)':>15s} {'residual':>15s} "
              f"{'rate':>10s}")
        print("-" * 56)

    def _print_iter(self, it, nrm):
        nrm = np.atleast_1d(nrm)
        rate = ""
        if len(self.res_history) >= 2:
            prev = np.atleast_1d(self.res_history[-2])
            with np.errstate(divide="ignore", invalid="ignore"):
                rate = " ".join(f"{r:10.4f}" for r in
                                np.atleast_1d(nrm / prev))
        body = " ".join(f"{v:15.6e}" for v in nrm)
        print(f"{str(it):>10s} {_mem_gb():15.2f} {body} {rate}")

    def _print_footer(self, status, iters):
        print("-" * 56)
        print(f"Total Iterations: {iters}")
        if self.res_history:
            final = np.atleast_1d(self.res_history[-1])
            print("Avg Convergence Rate: ",
                  " ".join(f"{v:,.4f}" for v in np.atleast_1d(
                      (final / np.atleast_1d(self.res_history[0])) **
                      (1.0 / max(1, iters)))))
            print(f"Final Residual: "
                  f"{' '.join(f'{v:.6e}' for v in final)}")
        if self.obtain_timings:
            print(f"Total Time: {self.setup_time + self.solve_time:10.4f}")
            print(f"    setup: {self.setup_time:10.4f} s")
            print(f"    solve: {self.solve_time:10.4f} s")
            per_it = self.solve_time / max(1, iters)
            print(f"    solve(per iteration): {per_it:10.4f} s")


def _mem_gb() -> float:
    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        return stats.get("bytes_in_use", 0) / 2**30
    except Exception:
        return 0.0


def _dense_pad(op) -> int:
    return op.a.shape[0] // getattr(op, "block_dim", (1, 1))[0]


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

class SolverFactory:
    """Name -> class registry (reference: SolverFactory<T>, registrations in
    core.cu:612-641)."""

    _registry: Dict[str, type] = {}

    @classmethod
    def register(cls, name: str, solver_cls: type) -> None:
        cls._registry[name] = solver_cls

    @classmethod
    def names(cls):
        return sorted(cls._registry)

    @classmethod
    def allocate(cls, cfg: AMGConfig, scope: str = "default",
                 param: str = "solver") -> "Solver":
        """reference: SolverFactory::allocate(cfg, scope, "solver") —
        reads the solver name at (param, scope) and instantiates it bound to
        the child scope the config declares."""
        name, child_scope = cfg.get_pair(param, scope)
        solver_cls = cls._registry.get(name)
        if solver_cls is None:
            raise ValueError(f"Unknown solver '{name}' "
                             f"(registered: {cls.names()})")
        return solver_cls(cfg, child_scope)


def register_solver(name: str):
    def deco(cls):
        SolverFactory.register(name, cls)
        cls.registry_name = name
        return cls
    return deco
