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
from ..logging_util import amgx_output


def _out(msg: str) -> None:
    amgx_output(msg + "\n")


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
        self._cfg_mode = self.mode      # pre-promotion mode from the config
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
        self._jit_fused = None
        self.scaler = None
        self._perm = None              # fine-level reordering (RCM) state
        self._m_user = None            # user's handle when reordered

    # -- setup ----------------------------------------------------------------

    def setup(self, m) -> None:
        """Attach the system matrix and build internal state (reference:
        Solver::setup, solver.cu:341)."""
        t0 = time.perf_counter()
        from ..logging_util import profile_phase
        self._phase = profile_phase
        if isinstance(m, Matrix):
            m = self._maybe_reorder(m)
            self.m = m
            if m.csr is not None:
                # Mode resolution (reference: the mode is a template
                # parameter threaded through allocation): an explicitly
                # configured mode in THIS solver's scope wins; otherwise
                # the attached matrix's mode is adopted — so nested
                # solvers (preconditioners, smoothers, coarse solvers)
                # inherit the parent's resolved precision instead of the
                # registry default. The system's complexness then promotes
                # a real mode, and the resolved mode travels onward with
                # the matrix handle.
                from ..matrix import _complex_mode
                explicit = any(sc == self.scope and nm == "mode"
                               for (sc, nm), _ in self.cfg.items())
                base = self._cfg_mode if (explicit or m.mode == "dDDI") \
                    else m.mode
                self.mode = _complex_mode(base, m.csr.data)
                m.mode = self.mode
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
        if self.cfg.get("print_config", self.scope):
            _out(f"Configuration ({type(self).__name__} @ scope "
                 f"'{self.scope}'):")
            for (sc, name), val in sorted(self.cfg.items()):
                _out(f"  {sc}:{name} = {val!r}")
        with profile_phase(f"setup:{type(self).__name__}"):
            self.solver_setup()
        # NOTE: the jit caches are intentionally NOT reset: every solve
        # program takes the whole device-state pytree as a jit operand
        # (see _device_state), so a re-setup with unchanged structure (the
        # resetup / replace_coefficients time-stepping path) reuses the
        # compiled programs; structural changes recompile via the pytree
        # treedef in jit's cache key. Python-side statics that get BAKED
        # into traces (e.g. a color count driving an unrolled loop, numpy
        # index tables) are not part of jax's key, so a static signature
        # of the solver tree guards them: any change invalidates the
        # caches. Exotic operators that aren't pytree nodes can't ride as
        # operands — always invalidate for those.
        sig = _collect_static_sig(self, set())
        if sig != getattr(self, "_jit_static_sig", None) or not (
                self.op is None or isinstance(self.op, jax.Array)
                or hasattr(self.op, "tree_flatten")):
            self._jit_iteration = None
            self._jit_first = None
            self._jit_fused = None
            self._jit_static_sig = sig
        self.setup_time = time.perf_counter() - t0

    def _maybe_reorder(self, m: Matrix) -> Matrix:
        """Fine-level reordering (the TPU analog of the reference's
        reorder-by-color setup step, solver.cu:433): when the user's row
        ordering defeats the banded layouts, RCM-permute the whole system
        once at setup. Everything downstream — coloring, scalers, the AMG
        hierarchy, inner solvers — sees the permuted index space; solve
        vectors cross the boundary through prepare/extract_vector. Nested
        solvers receive the already-permuted handle (aux flag) and never
        re-permute."""
        csr = m.csr
        mode = str(self.cfg.get("fine_level_reordering", self.scope))
        from ..ops import band as band_mod
        if (getattr(self, "_resetup_child", False)
                and self._perm is not None and csr is not None
                and csr.n_rows == self._perm.shape[0]
                and not csr.aux.get("fine_reordered")):
            # resetup: structure unchanged, reuse the stored permutation
            # (the RCM recomputation is the expensive part)
            pcsr = band_mod.permute_square(csr, self._perm)
            pcsr.aux.update(csr.aux)
            pcsr.aux["fine_reordered"] = True
            pm = Matrix(pcsr, mode=m.mode)
            self._m_user = m
            return pm
        self._perm = None
        self._m_user = None
        if (csr is None or mode == "NONE" or m.manager is not None
                or self.is_smoother or csr.block_dim != (1, 1)
                or csr.n_rows == 0 or csr.aux.get("fine_reordered")):
            return m
        if mode == "AUTO":
            if csr.n_rows <= 256:
                return m
            from ..ops.spmv import csr_to_dia
            if csr_to_dia(csr) is not None:
                return m
            # reorder only when RCM buys a materially narrower band than
            # the user's ordering AND the RCM'd band fits the strip format
            n = csr.n_rows
            rows = np.repeat(np.arange(n), csr.row_nnz())
            perm = band_mod.rcm_permutation(csr)
            rank = np.empty_like(perm)
            rank[perm] = np.arange(n)
            bw = int(np.abs(rank[rows] - rank[csr.indices]).max()) \
                if csr.nnz else 0
            hw_rcm = max(128, ((bw + 128) // 128) * 128)
            tiles = -(-n // 128)
            itemsize = np.dtype(csr.data.dtype).itemsize
            if (2 * hw_rcm > 4096 or
                    tiles * 128 * 2 * hw_rcm * itemsize > 512 * 1024 * 1024):
                return m             # gather territory even after RCM
            hw_cur = band_mod.tile_halfwidth(rows, csr.indices, n)
            if 2 * hw_cur <= 4096 and hw_cur <= 2 * hw_rcm:
                return m             # current ordering is already fine
        else:
            perm = band_mod.rcm_permutation(csr)
        pcsr = band_mod.permute_square(csr, perm)
        pcsr.aux.update(csr.aux)
        pcsr.aux["fine_reordered"] = True
        pm = Matrix(pcsr, mode=m.mode)
        self._m_user = m
        self._perm = np.asarray(perm)
        return pm

    def resetup(self, m=None) -> None:
        """Reference: AMGX_solver_resetup — values changed, structure kept.
        Re-runs the setup plumbing but lets nested solvers reuse structure
        (the AMG child honors structure_reuse_levels; reference:
        AMG_Solver::setup structure_reuse gate, amg_solver.cu:201-207)."""
        self._resetup_child = True
        try:
            self.setup(m if m is not None else (self._m_user or self.m))
        finally:
            self._resetup_child = False

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
        a = np.asarray(v).reshape(-1)
        if self._perm is not None and a.shape[0] >= self._perm.shape[0]:
            n = self._perm.shape[0]
            a = np.concatenate([a[self._perm], a[n:]])
        v = jnp.asarray(a, dtype=vec_dt)
        return blas.pad_vector(v, self.vec_len)

    def extract_vector(self, v) -> np.ndarray:
        n = self.op.n_rows * self.block_dim[0]
        out = np.asarray(v)[:n]
        if self._perm is not None:
            back = np.empty_like(out)
            back[self._perm] = out
            out = back
        return out

    # -- fused on-device solve loop -------------------------------------------

    def _can_fuse(self) -> bool:
        """The whole iterate/convergence loop can run as one jitted
        lax.while_loop when nothing needs the host per iteration. This is
        the TPU-critical path: per-iteration host dispatch costs ~ms of
        launch latency (worse through remote tunnels), so fusing turns N
        dispatches into 1."""
        if not bool(self.cfg.get("fused_solve", self.scope)):
            return False
        # print_solve_stats does NOT unfuse: the residual table is printed
        # post-hoc from the fetched history (identical output, one fetch —
        # live per-iteration printing would cost a tunnel round trip each)
        conv = self.cfg.get("convergence", self.scope)
        return conv in ("ABSOLUTE", "RELATIVE_INI", "RELATIVE_INI_CORE",
                        "COMBINED_REL_INI_ABS")

    def _fused_norm(self, b, x, state):
        if (isinstance(state, dict) and "nrm" in state
                and self.norm == "L2"
                and (self.use_scalar_norm or self.block_dim[0] == 1)):
            return state["nrm"]
        r = state.get("r") if isinstance(state, dict) else None
        if r is None:
            r = b - self.op.apply(x)
        bd = self.block_dim[0]
        return blas.get_norm(r, self.norm, bd,
                             self.use_scalar_norm or bd == 1)

    def _fused_converged(self, nrm, ini):
        conv = self.cfg.get("convergence", self.scope)
        tol = self.tolerance
        if conv == "ABSOLUTE":
            ok = nrm <= tol
        elif conv in ("RELATIVE_INI", "RELATIVE_INI_CORE"):
            ok = nrm <= tol * ini
        else:  # COMBINED_REL_INI_ABS
            rel = self.cfg.get("alt_rel_tolerance", self.scope)
            ok = (nrm <= tol) | (nrm <= rel * ini)
        return jnp.all(ok)

    def _fused_solve_fn(self, zg: bool):
        max_iters, min_iters = self.max_iters, self.min_iters
        monitor = self.monitor_residual

        def fused(b, x):
            state0 = self.solve_init(b, x, zg)
            x1, st = self.first_iteration(b, x, state0, zg)
            if not monitor:
                def body_fixed(_, c):
                    xx, ss = c
                    return self.solve_iteration(b, xx, ss)
                x1, st = jax.lax.fori_loop(0, max_iters - 1, body_fixed,
                                           (x1, st))
                # [iters | hist] in ONE array: the host reads the whole
                # solve result in a single fetch (one tunnel round trip)
                return x1, jnp.concatenate(
                    [jnp.full((1,), max_iters, jnp.result_type(x.real)),
                     jnp.zeros((1,), jnp.result_type(x.real))])
            r0 = b if zg else b - self.op.apply(x)
            bd = self.block_dim[0]
            ini = blas.get_norm(r0, self.norm, bd,
                                self.use_scalar_norm or bd == 1)
            # already converged at the initial residual (e.g. b = 0): keep
            # the incoming iterate — the first iteration may be 0/0 = NaN.
            # converged(ini, ini) is exact for every criterion: ABSOLUTE
            # tests ini<=tol, relative ones only fire when ini == 0.
            pre_done = self._fused_converged(ini, ini) & (min_iters == 0)
            x1 = jnp.where(pre_done, x, x1)
            hist_len = max_iters + 1
            nrm1 = self._fused_norm(b, x1, st)
            nrm1 = jax.tree.map(lambda v: jnp.where(pre_done, 0.0, v), nrm1)
            hist = jnp.zeros((hist_len,), jnp.result_type(nrm1))
            hist = hist.at[0].set(jnp.max(jnp.atleast_1d(ini)))
            hist = hist.at[1].set(jnp.max(jnp.atleast_1d(nrm1)))
            done1 = pre_done | (self._fused_converged(nrm1, ini) &
                                (1 >= min_iters)) | \
                ~jnp.all(jnp.isfinite(jnp.atleast_1d(nrm1)))

            def cond(c):
                _, _, it, _, done = c
                return jnp.logical_and(~done, it < max_iters)

            def body(c):
                xx, ss, it, hh, _ = c
                xx, ss = self.solve_iteration(b, xx, ss)
                nrm = self._fused_norm(b, xx, ss)
                hh = hh.at[it + 1].set(jnp.max(jnp.atleast_1d(nrm)))
                conv_ok = self._fused_converged(nrm, ini) & \
                    (it + 1 >= min_iters)
                bad = ~jnp.all(jnp.isfinite(jnp.atleast_1d(nrm)))
                return (xx, ss, it + 1, hh, conv_ok | bad)

            x_f, _, it, hist, _ = jax.lax.while_loop(
                cond, body, (x1, st, jnp.asarray(1, jnp.int32), hist,
                             done1))
            return x_f, jnp.concatenate(
                [it[None].astype(hist.dtype), hist])
        return fused

    # -- the outer solve loop -----------------------------------------------------

    def solve(self, b, x=None, zero_initial_guess: bool = False):
        """Reference: Solver::solve (solver.cu:589-858). Returns
        (x_device, status)."""
        from ..logging_util import profile_phase
        with profile_phase(f"solve:{type(self).__name__}"):
            return self._solve_impl(b, x, zero_initial_guess)

    def _solve_impl(self, b, x=None, zero_initial_guess: bool = False):
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

        zg_f = bool(zero_initial_guess)
        if self._can_fuse():
            return self._solve_fused(b, x, zg_f, t0)

        bd = self.block_dim[0]
        norm_of = lambda r: blas.get_norm(
            r, self.norm, bd, self.use_scalar_norm or bd == 1)

        if self._jit_iteration is None:
            # device state rides as an operand (cf. _solve_fused) so these
            # programs survive value-only re-setups without retracing
            def _it(dev, b_, x_, s_):
                saved = self._apply_device_state(dev)
                try:
                    return self.solve_iteration(b_, x_, s_)
                finally:
                    self._apply_device_state(saved)

            def _first(dev, b_, x_, zg):
                saved = self._apply_device_state(dev)
                try:
                    return self.first_iteration(
                        b_, x_, self.solve_init(b_, x_, zg), zg)
                finally:
                    self._apply_device_state(saved)

            self._jit_iteration = jax.jit(_it)
            # two first-iteration programs: zero guess / warm start
            self._jit_first = {
                zg: jax.jit(lambda dev, b_, x_, zg=zg: _first(
                    dev, b_, x_, zg))
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
        dev_state = self._device_state()   # immutable during one solve
        while not done and it < self.max_iters:
            if it == 0:
                x, state = self._jit_first[zg](dev_state, b, x)
            else:
                x, state = self._jit_iteration(dev_state, b, x, state)
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

    # -- device-state pytree (operator + factors as jit operands) -------------

    def _device_state(self):
        """Collect every device buffer the traced solve reads — operators,
        inverse diagonals, LU factors, color tables, spectral bounds —
        keyed by attribute path. Passing this pytree as a jit operand (and
        rebinding it during trace, _solve_fused) makes the compiled fused
        program reusable across value-only re-setups: the reference's
        resetup/replace_coefficients time-stepping path never pays a
        re-trace, only new device buffers."""
        state = {}
        _collect_device_state(self, "", state, set())
        return state

    def _apply_device_state(self, state):
        """Set buffers from a `_device_state` pytree; returns the previous
        values so a trace-time rebind can be undone."""
        saved = {}
        for path, val in state.items():
            obj = self
            parts = path.split(".")
            for p in parts[:-1]:
                obj = _state_child(obj, p)
            leaf = parts[-1]
            saved[path] = getattr(obj, leaf)
            setattr(obj, leaf, val)
        return saved

    def _solve_fused(self, b, x, zg: bool, t0: float):
        from .. import aotcache
        if getattr(self, "_jit_fused", None) is None:
            self._jit_fused = {}
        dev = self._device_state()
        # AOT executables are TPU-only: CPU AOT artifacts are machine-
        # feature-sensitive and strict about device placement (the 8-dev
        # virtual test mesh trips both); jax.jit re-specializes freely
        use_aot = jax.default_backend() == "tpu"
        sig = aotcache.abstract_sig((dev, b, x)) if use_aot else None
        ent = self._jit_fused.get(zg)
        if ent is None or ent[0] != sig:
            def run(dev_state, b_, x_, zg=zg):
                saved = self._apply_device_state(dev_state)
                try:
                    return self._fused_solve_fn(zg)(b_, x_)
                finally:
                    self._apply_device_state(saved)
            if use_aot:
                # AOT-cached compiled executable: a fresh process with
                # the same (config, level-shape signature) skips trace+
                # lower+compile entirely (reference: ~1 ms setup,
                # README.md:109)
                key = aotcache.signature(
                    "fused_solve", zg,
                    sorted(repr(kv) for kv in self.cfg.items()), sig)
                fn = aotcache.load_or_compile(key, run, dev, b, x)
            else:
                fn = jax.jit(run)
            self._jit_fused[zg] = (sig, fn)
        else:
            fn = ent[1]
        x_f, packed = fn(dev, b, x)
        if self.scaler is not None:
            x_f = self.scaler.unscale_solution(x_f)
        # ONE host fetch per solve: [iters | residual history] ride one
        # array, and the solution comes back in the same batched
        # device_get (a second fetch costs a full tunnel round trip;
        # every caller fetches x right after anyway)
        x_f, pk = jax.device_get((x_f, packed))
        it = int(pk[0])
        hist = pk[1:]
        status = SolveStatus.SUCCESS
        if self.monitor_residual:
            h = hist[:it + 1]
            self.res_history = [v for v in h]
            self.convergence.init(h[0])
            if not np.all(np.isfinite(h)):
                status = SolveStatus.DIVERGED
            else:
                ok = False
                for v in h[1:]:
                    ok = self.convergence.converged(v)
                status = SolveStatus.SUCCESS if ok \
                    else SolveStatus.NOT_CONVERGED
        self.last_iters = it
        self.solve_time = time.perf_counter() - t0
        if self.print_solve_stats:
            # post-hoc residual table from the single fetched history
            self._print_header()
            if self.monitor_residual and len(self.res_history):
                self.res_history = [self.res_history[0]]
                self._print_iter("Ini", hist[0])
                for k in range(1, it + 1):
                    self.res_history = [v for v in hist[:k + 1]]
                    self._print_iter(k, hist[k])
            self._print_footer(status, it)
        return x_f, status

    # -- preconditioner protocol ----------------------------------------------------

    def as_preconditioner(self) -> Callable:
        """Pure z = M^{-1} r running ``max_iters`` unmonitored iterations from
        a zero guess (reference: preconditioner->solve(r, z, true))."""
        def apply(r):
            z = jnp.zeros_like(r)
            state = self.solve_init(r, z, True)
            z, state = self.first_iteration(r, z, state, True)
            if self.max_iters > 1:
                # keep the traced graph small: the remaining sweeps run as a
                # device loop, not an unrolled chain
                def body(_, c):
                    zz, ss = c
                    return self.solve_iteration(r, zz, ss)
                z, state = jax.lax.fori_loop(0, self.max_iters - 1, body,
                                             (z, state))
            return z
        return apply

    # -- printing (reference: Solver::print_* solver.cu:722-832) ----------------------

    def _print_header(self):
        _out(f"{'iter':>10s} {'Mem Usage (GB)':>15s} {'residual':>15s} "
             f"{'rate':>10s}")
        _out("-" * 56)

    def _print_iter(self, it, nrm):
        nrm = np.atleast_1d(nrm)
        rate = ""
        if len(self.res_history) >= 2:
            prev = np.atleast_1d(self.res_history[-2])
            with np.errstate(divide="ignore", invalid="ignore"):
                rate = " ".join(f"{r:10.4f}" for r in
                                np.atleast_1d(nrm / prev))
        body = " ".join(f"{v:15.6e}" for v in nrm)
        _out(f"{str(it):>10s} {_mem_gb():15.2f} {body} {rate}")

    def _print_footer(self, status, iters):
        _out("-" * 56)
        _out(f"Total Iterations: {iters}")
        if self.res_history:
            final = np.atleast_1d(self.res_history[-1])
            _out("Avg Convergence Rate:  " +
                 " ".join(f"{v:,.4f}" for v in np.atleast_1d(
                     (final / np.atleast_1d(self.res_history[0])) **
                     (1.0 / max(1, iters)))))
            _out(f"Final Residual: "
                 f"{' '.join(f'{v:.6e}' for v in final)}")
        if self.obtain_timings:
            _out(f"Total Time: {self.setup_time + self.solve_time:10.4f}")
            _out(f"    setup: {self.setup_time:10.4f} s")
            _out(f"    solve: {self.solve_time:10.4f} s")
            per_it = self.solve_time / max(1, iters)
            _out(f"    solve(per iteration): {per_it:10.4f} s")


def _is_device_leaf(val) -> bool:
    """True for values that can ride as jit operands wholesale: device
    arrays, registered device-op pytrees (EllMatrix/DiaMatrix/BandMatrix/
    DenseOperator/GatherMatrix duck-typed via tree_flatten+apply), and
    plain containers whose leaves are all device arrays."""
    if isinstance(val, jax.Array):
        return True
    if isinstance(val, (tuple, list, dict)):
        leaves = jax.tree_util.tree_leaves(val)
        return bool(leaves) and all(isinstance(l, jax.Array)
                                    for l in leaves)
    return hasattr(val, "tree_flatten") and hasattr(val, "apply")


# Shared traversal rules for the two solver-tree walkers below. The
# device-state collection (jit operands) and the static signature (cache
# invalidation) MUST visit the same object graph — a class reachable by
# one but not the other silently breaks either operand freshness or
# invalidation — so the skip-set and recursion predicates live here once.
_WALK_SKIP = ("cfg", "res_history", "convergence")


def _is_solver_node(val) -> bool:
    return isinstance(val, (Solver, Matrix)) or \
        type(val).__name__ in ("AMG", "AMGLevel")


def _is_level_list(val) -> bool:
    return isinstance(val, list) and bool(val) and \
        type(val[0]).__name__ == "AMGLevel"


def _walk_attrs(obj):
    for name in sorted(vars(obj)):
        if name.startswith("_jit") or name in _WALK_SKIP:
            continue
        yield name, vars(obj)[name]


def _collect_device_state(obj, prefix: str, state: dict, seen: set) -> None:
    """Walk a solver tree (Solver / AMG / AMGLevel / Matrix) gathering
    device buffers into `state` keyed by dotted attribute path (list
    elements as `name[i]`)."""
    if obj is None or id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, Matrix):
        dop = getattr(obj, "_device_op", None)
        if dop is not None and _is_device_leaf(dop):
            state[f"{prefix}._device_op" if prefix else "_device_op"] = dop
        return
    for name, val in _walk_attrs(obj):
        path = f"{prefix}.{name}" if prefix else name
        if _is_device_leaf(val):
            state[path] = val
        elif _is_solver_node(val):
            _collect_device_state(val, path, state, seen)
        elif _is_level_list(val):
            for i, lv in enumerate(val):
                _collect_device_state(lv, f"{path}[{i}]", state, seen)


def _collect_static_sig(obj, seen: set):
    """Equality-comparable snapshot of the Python-side statics the traced
    programs bake in (scalars and numpy tables on the solver tree; device
    arrays/pytree ops are excluded — they ride as jit operands). Used to
    invalidate compiled programs when a re-setup changes statics that
    jax's operand-based cache key cannot see."""
    if obj is None or id(obj) in seen:
        return None
    seen.add(id(obj))
    if isinstance(obj, Matrix):
        return ("Matrix", getattr(obj.csr, "shape", None),
                getattr(obj.csr, "block_dim", None))
    items = []
    for name, val in _walk_attrs(obj):
        if name in ("scaler", "setup_time", "solve_time", "last_iters") \
                or _is_device_leaf(val) or callable(val):
            continue
        if isinstance(val, (int, float, bool, str, bytes, type(None),
                            np.integer, np.floating, np.bool_)):
            items.append((name, val))
        elif isinstance(val, np.ndarray):
            import hashlib
            items.append((name, val.shape, val.dtype.str,
                          hashlib.sha1(np.ascontiguousarray(val)
                                       .tobytes()).hexdigest()))
        elif isinstance(val, tuple) and all(
                isinstance(v, (int, float, bool, str, type(None)))
                for v in val):
            items.append((name, val))
        elif _is_solver_node(val):
            items.append((name, _collect_static_sig(val, seen)))
        elif _is_level_list(val):
            items.append((name, tuple(_collect_static_sig(lv, seen)
                                      for lv in val)))
    return (type(obj).__name__, tuple(items))


def _state_child(obj, token: str):
    if token.endswith("]"):
        name, idx = token[:-1].split("[")
        return getattr(obj, name)[int(idx)]
    return getattr(obj, token)


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
