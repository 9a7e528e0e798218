"""Eigensolver base + factory + AMG_EigenSolver facade.

References: base/include/eigensolvers/eigensolver.h:48-174,
base/src/eigensolvers/eigensolver.cu:205-356 (solve loop),
base/src/amg_eigensolver.cu (facade), registry eigensolvers plugin
(eigensolvers/src/eigensolvers.cu:28-80).

The eig_which selection reproduces the reference semantics:
  largest    — iterate on A
  smallest   — inverse iteration through a configured linear solver
  shift      — iterate on (A - eig_shift I)
  pagerank   — power iteration on the Google matrix (PagerankOperator)
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import AMGConfig
from ..matrix import Matrix, mode_dtypes
from ..operators import ShiftedOperator
from ..ops import blas


class EigenSolver:
    """Base eigensolver mirroring the reference's solve_init/solve_iteration
    loop."""

    def __init__(self, cfg: AMGConfig, scope: str = "default"):
        self.cfg = cfg
        self.scope = scope
        g = lambda k: cfg.get(k, scope)
        self.max_iters = g("eig_max_iters")
        self.tolerance = g("eig_tolerance")
        self.which = g("eig_which")
        self.shift = g("eig_shift")
        self.wanted = g("eig_wanted_count")
        self.damping = g("eig_damping_factor")
        self.krylov_dim = g("eig_krylov_dim")
        self.mode = g("mode")
        self.m: Optional[Matrix] = None
        self.op = None
        self.eigenvalues: List[float] = []
        self.eigenvectors = None
        self.setup_time = 0.0
        self.solve_time = 0.0
        self.last_iters = 0

    # -- setup ------------------------------------------------------------

    def setup(self, m) -> None:
        t0 = time.perf_counter()
        if isinstance(m, Matrix):
            self.m = m
            self.op = m.device_op()
        else:
            self.op = m
        if self.which == "shift" and self.shift != 0.0:
            self.op = ShiftedOperator(self.op, self.shift)
        self.solver_setup()
        self.setup_time = time.perf_counter() - t0

    def pagerank_setup(self, m) -> None:
        """Reference: AMG_EigenSolver::pagerank_setup — build the Google
        matrix operator from an adjacency matrix."""
        from ..operators import PagerankOperator
        from ..matrix import csr_to_ell
        if not isinstance(m, Matrix):
            raise ValueError("pagerank_setup needs a Matrix handle")
        self.m = m
        csr = m.csr
        outdeg = np.zeros(csr.n_rows)
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        np.add.at(outdeg, rows, np.abs(csr.data))
        inv = np.where(outdeg > 0, 1.0 / np.where(outdeg == 0, 1.0, outdeg),
                       0.0)
        n_pad = blas.pad_to(csr.n_rows)
        inv_p = np.zeros(n_pad)
        inv_p[:csr.n_rows] = inv
        dang = np.zeros(n_pad)
        dang[:csr.n_rows] = (outdeg == 0).astype(np.float64)
        at = csr_to_ell(csr.transpose())
        self.op = PagerankOperator(at, jnp.asarray(inv_p), self.damping,
                                   jnp.asarray(dang))
        self.which = "pagerank"
        self.solver_setup()

    def solver_setup(self) -> None:
        pass

    # -- solve loop ----------------------------------------------------------

    def solve(self, x0=None):
        """Returns (eigenvalues, eigenvectors ndarray (k, n))."""
        t0 = time.perf_counter()
        n = self._veclen()
        vec_dt, _ = mode_dtypes(self.mode)
        if x0 is None:
            rng = np.random.default_rng(7)
            v = rng.standard_normal(self._logical_len())
            x0 = np.zeros(n)
            x0[:v.shape[0]] = v
        x = jnp.asarray(np.asarray(x0, dtype=np.float64).reshape(-1))
        if x.shape[0] < n:
            x = jnp.pad(x, (0, n - x.shape[0]))
        x = x.astype(vec_dt)
        it, state = self._run(x)
        self.last_iters = it
        self.finalize(state)
        self.solve_time = time.perf_counter() - t0
        return self.eigenvalues, self.eigenvectors

    def _run(self, x):
        """Drive the iteration to convergence; returns (iters, state).

        The base implementation is the reference's host loop
        (eigensolver.cu:244-251). Methods override this with
        device-resident loops (lax.while_loop / batched fori_loop) so an
        entire solve is 1-2 XLA dispatches instead of per-iteration host
        round trips — the TPU-critical path through the remote tunnel."""
        state = self.solve_init(x)
        it = 0
        converged = False
        while it < self.max_iters and not converged:
            state = self.solve_iteration(state)
            it += 1
            converged = self.check_convergence(state)
        return it, state

    def _op_is_operand(self) -> bool:
        """True when the operator can ride as a jit operand (registered
        pytree with a traceable apply) — the prerequisite for the fused
        device-resident loops."""
        op = self.op
        return hasattr(op, "tree_flatten") and hasattr(op, "apply")

    def _veclen(self) -> int:
        op = self.op
        # unwrap composed operators (Shifted/Solver/Pagerank) to the concrete
        # device matrix that knows its padded size
        while not hasattr(op, "n_pad") and not hasattr(op, "a"):
            op = getattr(op, "op", None) or getattr(op, "op_t")
        n_pad = getattr(op, "n_pad", None)
        if n_pad is None:
            n_pad = op.a.shape[0]
        bx = getattr(op, "block_dim", (1, 1))[0]
        return n_pad * bx

    def _logical_len(self) -> int:
        bx = getattr(self.op, "block_dim", (1, 1))[0]
        return self.op.shape[0] * bx

    # subclass hooks
    def solve_init(self, x):
        raise NotImplementedError

    def solve_iteration(self, state):
        raise NotImplementedError

    def check_convergence(self, state) -> bool:
        return bool(np.asarray(state.get("resid", np.inf)) < self.tolerance)

    def finalize(self, state) -> None:
        self.eigenvalues = [float(np.asarray(state["lam"]))]
        v = np.asarray(state["v"])[: self._logical_len()]
        self.eigenvectors = v[None, :]


class EigenSolverFactory:
    _registry: Dict[str, type] = {}

    @classmethod
    def register(cls, name: str, solver_cls: type) -> None:
        cls._registry[name] = solver_cls

    @classmethod
    def names(cls):
        return sorted(cls._registry)

    @classmethod
    def allocate(cls, cfg: AMGConfig, scope: str = "default") -> EigenSolver:
        name, child = cfg.get_pair("eig_solver", scope)
        sc = cls._registry.get(name)
        if sc is None:
            raise ValueError(f"Unknown eigensolver '{name}' "
                             f"(registered: {cls.names()})")
        return sc(cfg, child)


def register_eigensolver(name: str):
    def deco(cls):
        EigenSolverFactory.register(name, cls)
        cls.registry_name = name
        return cls
    return deco


class AMGEigenSolver:
    """Facade mirroring AMG_EigenSolver (base/src/amg_eigensolver.cu:44-100):
    owns resources/config and an EigenSolver instance."""

    def __init__(self, cfg: AMGConfig, resources=None, scope: str = "default"):
        self.cfg = cfg
        self.resources = resources
        self.solver = EigenSolverFactory.allocate(cfg, scope)

    def setup(self, m) -> None:
        self.solver.setup(m)

    def pagerank_setup(self, m) -> None:
        self.solver.pagerank_setup(m)

    def solve(self, x0=None):
        return self.solver.solve(x0)
