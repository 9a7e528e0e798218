"""Distributed solve: row-partitioned Krylov + AMG over a jax mesh.

The TPU-native analog of the reference's distributed solve path
(AMG_Solver::solve with MPI halo exchange). The full solver step — Krylov
update, AMG V-cycle, halo exchanges, reductions — is one shard_map-ped,
jitted XLA program per iteration; the convergence loop stays on host like
the reference's.

Coarse-grid consolidation (reference: glue.h, amg.cu:328-391) maps to
replicating the coarsest problem: once a level is small, its solve runs
identically on every shard from an all-gathered residual — the "consolidate
to 1 rank" strategy with zero idle ranks.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import AMGConfig
from ..matrix import CSRMatrix, Matrix, mode_dtypes
from . import comms
from .partition import DistEllMatrix, RowPartition


def _flatten_level_args(args):
    """None placeholders -> () so the level args form a uniform pytree."""
    return tuple(tuple(s if s is not None else () for s in lvl)
                 for lvl in args)


def _unflatten(flat):
    return [tuple(None if (isinstance(s, tuple) and len(s) == 0) else s
                  for s in lvl) for lvl in flat]


def _freeze(obj):
    """Equality-comparable snapshot of nested static metadata (numpy
    arrays compared by shape/dtype/content digest)."""
    import hashlib
    if isinstance(obj, jax.Array):
        obj = np.asarray(obj)
    if isinstance(obj, np.ndarray):
        return ("nd", obj.shape, obj.dtype.str,
                hashlib.sha1(np.ascontiguousarray(obj).tobytes())
                .hexdigest())
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    return obj


def _tree_sig(tree):
    """Pytree structure + leaf shapes/dtypes (NOT values)."""
    leaves, treedef = jax.tree.flatten(tree)
    return (str(treedef),
            tuple((getattr(l, "shape", ()), str(getattr(l, "dtype", "")))
                  for l in leaves))


def make_mesh(n_dev: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_dev or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


class DistLevel:
    """One distributed AMG level: sharded A, P, R + smoother data."""

    def __init__(self, a: DistEllMatrix, inv_diag=None):
        self.a = a
        self.p: Optional[DistEllMatrix] = None
        self.r: Optional[DistEllMatrix] = None
        self.inv_diag = inv_diag          # (D, Lr) sharded
        self.coarse_dense = None          # replicated dense coarse solve
        self.gs = None                    # (lower, upper) two-stage GS ops


class DistributedSolver:
    """Distributed PCG/CG/(Chebyshev-smoothed) AMG solver.

    Setup is host-orchestrated on the global matrix (like the reference's
    CPU-driven hierarchy loop); every per-level operator is then sharded
    over the mesh and the solve step compiles to a single SPMD program.
    """

    def __init__(self, cfg: AMGConfig, mesh: Optional[Mesh] = None,
                 axis: str = "x", scope: str = "default"):
        self.cfg = cfg
        self.scope = scope
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        g = lambda k: cfg.get(k, scope)
        name, child = cfg.get_pair("solver", scope)
        self.solver_name = name
        if child != "default":
            self.scope = child
            g = lambda k: cfg.get(k, self.scope)
        self.max_iters = g("max_iters")
        self.tolerance = g("tolerance")
        self.convergence = g("convergence")
        self.monitor = bool(g("monitor_residual"))
        self.mode = g("mode")
        self.use_amg = False
        pre, _ = cfg.get_pair("preconditioner", self.scope)
        self.precond_name = pre
        self.levels: List[DistLevel] = []
        self.setup_time = 0.0
        self.solve_time = 0.0
        self.last_iters = 0
        self.res_history: List[float] = []

    # -- setup -------------------------------------------------------------

    def _apply_scaling(self, csr: CSRMatrix) -> CSRMatrix:
        """Equation re-scaling before partitioning (reference: Scaler hooks
        in Solver::setup/solve, solver.cu:469-482/669-676). Returns a
        scaled copy; the user's matrix is untouched."""
        scaling = self.cfg.get("scaling", self.scope)
        self._scaler = None
        if scaling == "NONE":
            return csr
        from .. import scalers as _scalers
        from ..matrix import Matrix as _Matrix
        work = CSRMatrix(csr.n_rows, csr.n_cols, csr.indptr, csr.indices,
                         csr.data.copy(), block_dim=csr.block_dim,
                         diag_data=None if csr.diag_data is None
                         else csr.diag_data.copy())
        mm = _Matrix(work)
        self._scaler = _scalers.make_scaler(scaling, self.cfg, self.scope)
        self._scaler.setup(mm)
        return mm.csr

    def setup(self, csr,
              row_part: Optional[RowPartition] = None) -> None:
        """``csr`` is either a global CSRMatrix or a (possibly partial)
        ShardedCSR — the rank-local entry where each process passes only
        its addressable devices' row blocks (the reference's
        loadDistributedMatrix contract, distributed_manager.cu:1144/1359):
        no global operator is ever materialized on any host."""
        t0 = time.perf_counter()
        from . import setup as dsetup
        sharded_in = isinstance(csr, dsetup.ShardedCSR)
        self._user_csr0 = csr
        if sharded_in:
            self._scaler = None
            self._dist_scaler = None
            scaling = self.cfg.get("scaling", self.scope)
            if scaling != "NONE":
                # rank-local scaling: scale a per-shard copy in place
                # (boundary-sized exchanges only; the reference scales
                # distributed systems the same way, solver.cu:469-482)
                from ..matrix import CSRMatrix as _CSR
                csr = dsetup.ShardedCSR(csr.part, [
                    None if s is None else _CSR(
                        s.n_rows, s.n_cols, s.indptr, s.indices,
                        s.data.copy(), block_dim=s.block_dim,
                        diag_data=None if s.diag_data is None
                        else s.diag_data.copy())
                    for s in csr.shards], csr.n_cols)
                self._dist_scaler = dsetup.dist_scale(
                    csr, scaling,
                    iterations=int(self.cfg.get("scaling_iterations",
                                                self.scope) or 10))
            row_part = csr.part
        else:
            self._dist_scaler = None
            csr = self._apply_scaling(csr)
        vec_dt, mat_dt = mode_dtypes(self.mode)
        n_dev = self.mesh.devices.size
        self._vec_dt = vec_dt
        amg_scope = None
        if self.precond_name not in ("AMG", "BLOCK_JACOBI", "JACOBI_L1",
                                     "CHEBYSHEV_POLY", "MULTICOLOR_DILU",
                                     "MULTICOLOR_GS", "FIXCOLOR_GS",
                                     "MULTICOLOR_ILU", "KACZMARZ", "GS",
                                     "NOSOLVER", "DUMMY", None):
            raise NotImplementedError(
                f"DistributedSolver does not implement preconditioner "
                f"'{self.precond_name}'; supported: AMG, BLOCK_JACOBI, "
                f"JACOBI_L1, CHEBYSHEV_POLY, GS, MULTICOLOR_DILU/GS/ILU, "
                f"FIXCOLOR_GS, KACZMARZ (single-chip SolverFactory "
                f"covers the full catalog)")
        if self.precond_name == "AMG":
            _, amg_scope = self.cfg.get_pair("preconditioner", self.scope)
            self.use_amg = True
        elif self.solver_name == "AMG":
            # standalone AMG: iterate V-cycles (reference: AMG solver =
            # one cycle per solve_iteration, algebraic_multigrid_solver.h)
            amg_scope = self.scope
            self.use_amg = True

        # JACOBI_L1 smoothing/preconditioning uses the L1-augmented
        # diagonal at every level (jacobi_l1_solver.cu); TWO_STAGE_GS
        # smoothing builds shard-local triangular operators per level
        self._smoother_l1 = False
        self._gs2 = False
        self._gs2_inner = 2
        self._gs2_symmetric = False
        self._dilu = False
        self._mcgs = False
        self._mcgs_fix4 = False
        self._mcgs_symmetric = False
        self._milu = False
        self._milu_scope = "default"
        self._kacz = False
        self._kacz_scope = "default"
        self._color_scope = "default"

        def _scalar_only(name):
            if csr.block_dim != (1, 1):
                raise NotImplementedError(
                    f"distributed {name} is scalar-only (BSR routes to "
                    f"the single-chip solver)")

        if self.use_amg and amg_scope is not None:
            sm_name, sm_scope0 = self.cfg.get_pair("smoother", amg_scope)
            self._smoother_l1 = sm_name == "JACOBI_L1"
            if sm_name == "MULTICOLOR_DILU":
                # BSR runs natively (round 5): blocked E factorization +
                # block color sweeps (multicolor_dilu_solver.cu is
                # natively blocked in the reference too)
                self._dilu = True
                self._color_scope = sm_scope0 \
                    if sm_scope0 != "default" else amg_scope
            if sm_name in ("MULTICOLOR_GS", "FIXCOLOR_GS", "GS"):
                # plain GS is color-sequential on TPU (the single-chip
                # GaussSeidelSolver sweeps colors too — there is no
                # sequential-row chain to preserve), so it rides the
                # multicolor machinery distributed (reference:
                # gauss_seidel_solver.cu runs distributed). BSR systems
                # run natively: block-row colors expand to scalar slots
                # and the inverse diagonal applies per block (round 5)
                if sm_name == "GS" and bool(self.cfg.get("GS_L1_variant",
                                                         sm_scope0)):
                    raise NotImplementedError(
                        "distributed GS does not implement GS_L1_variant "
                        "(single-chip SolverFactory covers it)")
                self._mcgs = True
                self._mcgs_fix4 = sm_name == "FIXCOLOR_GS"
                self._mcgs_symmetric = bool(self.cfg.get("symmetric_GS",
                                                         sm_scope0))
                self._color_scope = sm_scope0 \
                    if sm_scope0 != "default" else amg_scope
            if sm_name == "MULTICOLOR_ILU":
                _scalar_only("MULTICOLOR_ILU smoothing")
                self._milu = True
                self._milu_scope = sm_scope0
                self._color_scope = sm_scope0 \
                    if sm_scope0 != "default" else amg_scope
            if sm_name == "KACZMARZ":
                _scalar_only("KACZMARZ smoothing")
                self._kacz = True
                self._kacz_scope = sm_scope0 \
                    if sm_scope0 != "default" else amg_scope
            if sm_name == "TWO_STAGE_GS":
                _scalar_only("TWO_STAGE_GS smoothing")
                self._gs2 = True
                self._gs2_inner = max(1, int(self.cfg.get(
                    "gs_inner_sweeps", sm_scope0)))
                self._gs2_symmetric = bool(self.cfg.get("symmetric_GS",
                                                        sm_scope0))
        self._l1_diag = self._smoother_l1 or \
            self.precond_name == "JACOBI_L1"
        if self.precond_name in ("MULTICOLOR_DILU", "MULTICOLOR_GS",
                                 "FIXCOLOR_GS", "MULTICOLOR_ILU",
                                 "KACZMARZ", "GS"):
            if self.precond_name == "GS":
                _, _pc_scope0 = self.cfg.get_pair("preconditioner",
                                                  self.scope)
                if bool(self.cfg.get("GS_L1_variant", _pc_scope0)):
                    raise NotImplementedError(
                        "distributed GS does not implement GS_L1_variant")
            if self.precond_name in ("MULTICOLOR_ILU", "KACZMARZ"):
                _scalar_only(f"{self.precond_name} preconditioning")
            _, pc_scope = self.cfg.get_pair("preconditioner", self.scope)
            if self.precond_name == "MULTICOLOR_DILU":
                self._dilu = True
            elif self.precond_name == "MULTICOLOR_ILU":
                self._milu = True
                self._milu_scope = pc_scope
            elif self.precond_name == "KACZMARZ":
                self._kacz = True
                self._kacz_scope = pc_scope
            else:
                self._mcgs = True
                self._mcgs_fix4 = self.precond_name == "FIXCOLOR_GS"
                self._mcgs_symmetric = bool(self.cfg.get("symmetric_GS",
                                                         pc_scope))
            self._color_scope = pc_scope
            self.smooth_damp = self.cfg.get("relaxation_factor", pc_scope)
            # preconditioners iterate their scope's max_iters (single-chip
            # SolverFactory semantics: the inner solver runs as a solver);
            # applied under lax.fori_loop so trace size stays O(nc)
            self._dilu_pre_iters = max(1, int(
                self.cfg.get("max_iters", pc_scope)))
        # boundary_coloring policy (reference core.cu:372-377): SYNC_COLORS
        # (default) = per-color halo exchange, exact single-chip parity;
        # FIRST/LAST = shard-local triangles for the color solves (cross-
        # shard coupling stays in the outer residual — the hybrid
        # decomposition): one collective per sweep instead of per color
        self._color_local = self.cfg.get(
            "boundary_coloring", self._color_scope) != "SYNC_COLORS"

        # level 0: prefer the shard-local banded layout (no gathers, halo
        # confined to margin rows); fall back to interior-first rows for the
        # overlap split when the matrix isn't stencil-structured
        self._split0 = 0
        if sharded_in:
            a0 = DistEllMatrix.from_shards(
                csr.blocks(), csr.part, csr.part, csr.n_rows, csr.n_cols,
                dtype=mat_dt, mesh=self.mesh, axis=self.axis,
                sort_interior_first=False, block_dim=csr.block_dim)
        else:
            a0 = DistEllMatrix.from_global(csr, n_dev, row_part,
                                           dtype=mat_dt, mesh=self.mesh,
                                           axis=self.axis,
                                           sort_interior_first=False)
            if getattr(a0, "dia_bands", None) is None and \
                    getattr(a0, "band_strips", None) is None and \
                    getattr(a0, "gather_arrays", None) is None and \
                    not self.use_amg and not self._dilu and \
                    not self._mcgs and not self._milu and not self._kacz:
                a0 = DistEllMatrix.from_global(
                    csr, n_dev, row_part, dtype=mat_dt, mesh=self.mesh,
                    axis=self.axis, sort_interior_first=True)
                self._split0 = int(np.asarray(a0.interior_rows).min())
        # rank-local vector window: solve() accepts/returns this process's
        # owned rows only (the per-rank vector upload/download contract)
        self._rank_rows = None
        if sharded_in and csr.is_partial:
            devs = csr.devs
            self._rank_rows = (int(csr.part.offsets[devs[0]]),
                               int(csr.part.offsets[devs[-1] + 1]))
        inv0 = self._inv_diag_sharded(csr, a0, vec_dt, self.mesh,
                                      self.axis, l1=self._l1_diag) \
            if sharded_in else \
            self._inv_diag(csr, a0, vec_dt, self.mesh, self.axis,
                           l1=self._l1_diag)
        self.levels = [DistLevel(a0, inv0)]
        self._attach_smoother_level(self.levels[0], csr, a0, vec_dt)
        self._global_csrs = [csr]

        if self.use_amg:
            g = lambda k: self.cfg.get(k, amg_scope)
            algorithm = g("algorithm")
            selector = g("selector")
            if csr.block_dim != (1, 1) and algorithm != "AGGREGATION":
                # reference parity: classical AMG handles 1x1 only
                # (classical_amg_level.cu asserts block size 1); BSR coarsens
                # by the block graph through the aggregation path
                raise NotImplementedError(
                    "distributed classical AMG is scalar-only; use "
                    "algorithm=AGGREGATION for block (BSR) systems")
            max_levels = g("max_levels")
            # consolidation thresholds (reference: amg.cu:328-391 decision;
            # matrix_consolidation_lower/upper_threshold, core.cu):
            # when avg rows per *active* shard drops below `lower`, shrink
            # the active sub-mesh so each active shard holds ~`upper` rows
            cons_lower = g("matrix_consolidation_lower_threshold")
            cons_upper = max(1, g("matrix_consolidation_upper_threshold"))
            min_rows = g("min_coarse_rows") if cons_lower > 0 else \
                max(g("min_coarse_rows"),
                    2 * n_dev)            # keep >= 2 rows per shard
            self.presweeps = max(0, g("presweeps"))
            self.postsweeps = max(0, g("postsweeps"))
            self.cycle_type = g("cycle")
            # Chebyshev is the TPU-recommended smoother (SpMV + axpy only,
            # no colors/gathers; reference ships V-cheby configs). The
            # per-level lambda_max of D^-1 A is estimated at setup.
            # Smoother knobs come from the smoother's own (child) scope,
            # matching reference scoped-config semantics (a plain-string
            # "smoother" entry binds scope "default") and the single-chip
            # SolverFactory.allocate path.
            smoother_name, sm_scope = self.cfg.get_pair("smoother",
                                                        amg_scope)
            self.smooth_damp = self.cfg.get("relaxation_factor", sm_scope)
            self.cheby_smoothing = smoother_name in ("CHEBYSHEV",
                                                     "CHEBYSHEV_POLY")
            self.cheby_order = max(1, self.cfg.get(
                "chebyshev_polynomial_order", sm_scope))
            self._cheby_bounds = []
            shard_local = str(self.cfg.get("distributed_aggregation",
                                           amg_scope)) == "SHARD_LOCAL"
            interpolator = str(g("interpolator"))
            self._structure = []
            dense_lu_rows = g("dense_lu_num_rows")
            # Shard-parallel setup (computeAOperator_distributed,
            # classical_amg_level.cu:942; distributed renumbering,
            # distributed_manager.cu:1388): every coarsening step touches
            # only owned rows plus their one-ring halo, so per-shard setup
            # work and memory are O(N/P) and no global operator is
            # materialized below level 0. Covers PMIS/HMIS (+AGGRESSIVE),
            # CR, D1/D2/MULTIPASS/EM and shard-local aggregation (scalar
            # and BSR); only global-graph aggregation selectors
            # (shard_local=0) route through the assembled fallback.
            aggr_levels = int(g("aggressive_levels") or 0)
            aggr_sel = str(g("aggressive_selector"))
            if aggr_sel == "DEFAULT":
                aggr_sel = selector if selector.startswith("AGGRESSIVE") \
                    else "AGGRESSIVE_" + selector
            aggr_interp = str(g("aggressive_interpolator"))
            classical_ok = (
                selector in ("PMIS", "AGGRESSIVE_PMIS", "HMIS",
                             "AGGRESSIVE_HMIS", "CR")
                and interpolator in ("D1", "D2", "MULTIPASS")
                and (aggr_levels == 0 or
                     (aggr_sel in ("AGGRESSIVE_PMIS", "AGGRESSIVE_HMIS")
                      and aggr_interp in ("D1", "D2", "MULTIPASS"))))
            # BSR coarsens through shard-local aggregation (the
            # reference's natively-blocked distributed aggregation setup,
            # aggregation_amg_level.cu:1264-1579); classical/energymin
            # stay scalar-only (classical_amg_level.cu asserts block 1)
            self._sharded_setup = (
                (algorithm == "AGGREGATION" and shard_local) or
                (csr.block_dim == (1, 1) and
                 ((algorithm == "CLASSICAL" and classical_ok) or
                  algorithm == "ENERGYMIN")))
            if self._sharded_setup:
                self._setup_levels_sharded(
                    csr, g, amg_scope, algorithm, selector, interpolator,
                    max_levels, min_rows, dense_lu_rows, cons_lower,
                    cons_upper, mat_dt, vec_dt, n_dev)
                self._build_coarse_dense(vec_dt)
            else:
                self._setup_levels_global(
                    csr, g, amg_scope, algorithm, selector, shard_local,
                    max_levels, min_rows, dense_lu_rows, cons_lower,
                    cons_upper, mat_dt, vec_dt, n_dev)

        if self.solver_name == "CHEBYSHEV":
            # Jacobi-preconditioned Chebyshev: bounds on D^-1 A match the
            # iterated operator (cheb_solver.cu mode-0 semantics)
            self._cheb_solver_bounds = self._lambda_bounds_sharded(csr) \
                if sharded_in else self._lambda_bounds(csr)
        if self.precond_name == "CHEBYSHEV_POLY":
            _, pc_scope = self.cfg.get_pair("preconditioner", self.scope)
            self._cheb_precond_bounds = self._lambda_bounds_sharded(csr) \
                if sharded_in else self._lambda_bounds(csr)
            self._cheb_precond_order = max(1, int(self.cfg.get(
                "chebyshev_polynomial_order", pc_scope)))
        self._build_step()
        if self.use_amg and amg_scope is not None and \
                bool(self.cfg.get("print_grid_stats", amg_scope)):
            from ..logging_util import amgx_output
            amgx_output(self.grid_stats_string() + "\n")
        self.setup_time = time.perf_counter() - t0

    def _setup_levels_global(self, csr, g, amg_scope, algorithm, selector,
                             shard_local, max_levels, min_rows,
                             dense_lu_rows, cons_lower, cons_upper,
                             mat_dt, vec_dt, n_dev):
        """Assembled-operator coarsening fallback for global-graph selectors
        and interpolators: each level's selector runs on the global matrix
        (O(N) host work per level — the pre-shard-parallel path, kept for
        the coarsening algorithms whose graph is inherently global)."""
        if hasattr(csr, "shards"):
            # rank-local entry + global-graph algorithm: assemble once
            # (honest O(N) fallback; every shard-parallel-capable config
            # routes through _setup_levels_sharded instead)
            csr = csr.gather_full().to_global()
            self._global_csrs = [csr]
        if self.cheby_smoothing:
            self._cheby_bounds.append(self._lambda_bounds(csr))
        work = csr
        while len(self.levels) < max_levels and work.n_rows > min_rows:
            if dense_lu_rows and work.n_rows <= dense_lu_rows and \
                    len(self.levels) > 1:
                # reference: stop coarsening once the dense-LU coarse
                # solve takes over (amg.cu dense_lu_num_rows gate) —
                # matches the single-chip hierarchy driver
                break
            count_part = None
            if algorithm == "AGGREGATION":
                from ..amg.aggregation import select_aggregates, build_p_r
                if shard_local:
                    agg, nc, count_part = self._shard_local_aggregates(
                        work, self.levels[-1].a.row_part, selector,
                        amg_scope)
                else:
                    agg, nc = select_aggregates(work, selector, self.cfg,
                                                amg_scope)
                if nc == 0 or nc >= work.n_rows:
                    break
                p_csr, r_csr = build_p_r(agg, nc)
                from ..ops.spgemm import aggregation_galerkin
                ac = aggregation_galerkin(work, agg, nc)
            else:
                from ..amg import classical as cls_mod
                strong = cls_mod.strong_connections(
                    work, g("strength"), g("strength_threshold"))
                cf = cls_mod.select_cf(work, strong, selector, self.cfg,
                                       amg_scope)
                nc = int(cf.max()) + 1 if (cf >= 0).any() else 0
                if nc == 0 or nc >= work.n_rows:
                    break
                p_csr = cls_mod.direct_interpolation(work, strong, cf)
                r_csr = p_csr.transpose()
                from ..ops.spgemm import galerkin_product
                ac = galerkin_product(r_csr, work, p_csr)
            fine_part = self.levels[-1].a.row_part
            # consolidation decision: how many shards stay active for
            # the coarse level (never more than were active on the fine
            # level — consolidation only shrinks the sub-mesh)
            fine_active = int(np.sum(np.diff(fine_part.offsets) > 0))
            if cons_lower > 0 and nc < cons_lower * fine_active:
                n_active = min(fine_active,
                               max(1, -(-nc // cons_upper)))
            else:
                n_active = fine_active
            if n_active < n_dev:
                coarse_part = RowPartition.consolidated(nc, n_dev,
                                                        n_active)
            elif count_part is not None:
                # shard-local aggregation: coarse rows stay on the shard
                # that owns their fine aggregate — transfers (P/R) are
                # block-diagonal, so restrict/prolongate need no halo
                coarse_part = count_part
            else:
                coarse_part = RowPartition.equal(nc, n_dev)
            lvl = self.levels[-1]
            bx = csr.block_dim[0]
            if bx > 1:
                # scalar transfer entries become identity-scaled blocks so
                # block vectors move per component (mirror of the
                # single-chip _transfer_to_device, hierarchy.py)
                def _blk(t):
                    vals = np.einsum("k,ij->kij",
                                     t.data.astype(np.float64),
                                     np.eye(bx))
                    return CSRMatrix(t.n_rows, t.n_cols, t.indptr,
                                     t.indices, vals, block_dim=(bx, bx))
                p_dev, r_dev = _blk(p_csr), _blk(r_csr)
            else:
                p_dev, r_dev = p_csr, r_csr
            lvl.p = DistEllMatrix.from_global(
                p_dev, n_dev, fine_part, coarse_part, dtype=mat_dt,
                mesh=self.mesh, axis=self.axis,
                sort_interior_first=False)
            lvl.r = DistEllMatrix.from_global(
                r_dev, n_dev, coarse_part, fine_part, dtype=mat_dt,
                mesh=self.mesh, axis=self.axis,
                sort_interior_first=False)
            ad = DistEllMatrix.from_global(
                ac, n_dev, coarse_part, coarse_part, dtype=mat_dt,
                mesh=self.mesh, axis=self.axis,
                sort_interior_first=False)
            self.levels.append(DistLevel(ad, self._inv_diag(
                ac, ad, vec_dt, self.mesh, self.axis,
                l1=getattr(self, "_smoother_l1", False))))
            self._attach_smoother_level(self.levels[-1], ac, ad, vec_dt)
            if self.cheby_smoothing:
                self._cheby_bounds.append(self._lambda_bounds(ac))
            self._global_csrs.append(ac)
            self._structure.append(
                {"agg": agg if algorithm == "AGGREGATION" else None,
                 "nc": nc, "p_csr": p_csr, "r_csr": r_csr})
            work = ac
        self._build_coarse_dense(vec_dt)

    def _setup_levels_sharded(self, csr, g, amg_scope, algorithm, selector,
                              interpolator, max_levels, min_rows,
                              dense_lu_rows, cons_lower, cons_upper,
                              mat_dt, vec_dt, n_dev):
        """Shard-parallel AMG setup: selectors, interpolation and the
        Galerkin product all run per shard on owned rows + one-ring halo
        data (setup.py), reproducing the assembled pipeline bit-for-bit.
        The only O(N) step is the row slice at entry (the upload path);
        below level 0 no global operator exists. Reference:
        computeAOperator_distributed (classical_amg_level.cu:942),
        createOneRingHaloRows (distributed_manager.cu:1592)."""
        from . import setup as dsetup
        part0 = self.levels[0].a.row_part
        swork = csr if isinstance(csr, dsetup.ShardedCSR) else \
            dsetup.ShardedCSR.from_global(csr, part0)
        self._sharded_ops = [swork]
        if self.cheby_smoothing:
            self._cheby_bounds.append(self._lambda_bounds_sharded(swork))
        while len(self.levels) < max_levels and swork.n_rows > min_rows:
            if dense_lu_rows and swork.n_rows <= dense_lu_rows and \
                    len(self.levels) > 1:
                break
            fine_part = swork.part
            if algorithm == "AGGREGATION":
                agg, natural_part = dsetup.dist_shard_local_aggregates(
                    swork, selector, self.cfg, amg_scope)
                nc = int(natural_part.offsets[-1])
                if nc == 0 or nc >= swork.n_rows:
                    break
                sp_ = dsetup.dist_pc_interpolation(
                    fine_part, agg, nc, block_dim=swork.block_dim)
                info = {"agg": agg, "nc": nc, "p": sp_,
                        "natpart": natural_part}
            else:
                # aggressive coarsening on the first `aggressive_levels`
                # levels: AGGRESSIVE_PMIS (distance-2 independent set) +
                # the aggressive interpolator (MULTIPASS by default) —
                # mirrors the single-chip hierarchy driver
                level_idx = len(self.levels) - 1
                aggr_levels = int(g("aggressive_levels") or 0)
                aggr = level_idx < aggr_levels
                sel_now = selector
                interp_now = interpolator
                if aggr:
                    sel_now = str(g("aggressive_selector"))
                    if sel_now == "DEFAULT":
                        sel_now = selector if \
                            selector.startswith("AGGRESSIVE") \
                            else "AGGRESSIVE_" + selector
                    interp_now = str(g("aggressive_interpolator"))
                strong = dsetup.dist_strength(swork, g("strength"),
                                              g("strength_threshold"))
                if algorithm == "ENERGYMIN":
                    # reference: energymin forces the CR selector and the
                    # energy-minimizing interpolator
                    sel_now, interp_now = "CR", "EM"
                if sel_now == "CR":
                    cf, natural_part, nc = dsetup.dist_cr(swork)
                    if algorithm == "ENERGYMIN":
                        cf, natural_part, nc = dsetup.dist_ensure_coverage(
                            swork, strong, cf)
                else:
                    cf, natural_part, nc = dsetup.dist_pmis(
                        swork, strong,
                        aggressive=sel_now.startswith("AGGRESSIVE"),
                        variant="HMIS" if "HMIS" in sel_now else "PMIS")
                if nc == 0 or nc >= swork.n_rows:
                    break
                if interp_now == "EM":
                    sp_ = dsetup.dist_em_interpolation(
                        swork, strong, cf, nc, g("strength"),
                        g("strength_threshold"))
                elif interp_now == "D2":
                    sp_ = dsetup.dist_distance2_interpolation(
                        swork, strong, cf, nc, g("strength"),
                        g("strength_threshold"))
                elif interp_now == "MULTIPASS":
                    sp_ = dsetup.dist_multipass_interpolation(
                        swork, strong, cf, nc)
                else:
                    sp_ = dsetup.dist_direct_interpolation(swork, strong,
                                                           cf, nc)
                tf = g("interp_truncation_factor")
                tm = g("interp_max_elements")
                if (tf and tf > 0) or (tm and tm > 0):
                    # row-local truncation runs per shard unchanged
                    from ..amg.classical import truncate_interpolation
                    sp_ = dsetup.ShardedCSR(
                        fine_part,
                        [None if s is None else
                         truncate_interpolation(s, tf, tm)
                         for s in sp_.shards], nc)
                info = {"agg": None, "nc": nc, "p": sp_,
                        "natpart": natural_part}
            # consolidation decision (amg.cu:328-391): shrink the active
            # sub-mesh when average coarse rows per shard drop too low
            fine_active = int(np.sum(np.diff(fine_part.offsets) > 0))
            if cons_lower > 0 and nc < cons_lower * fine_active:
                n_active = min(fine_active, max(1, -(-nc // cons_upper)))
            else:
                n_active = fine_active
            nat_active = int(np.sum(np.diff(natural_part.offsets) > 0))
            if n_active < nat_active:
                coarse_part = RowPartition.consolidated(nc, n_dev, n_active)
            else:
                # coarse rows stay on the shard owning their fine parents:
                # transfers are block-diagonal (no halo in P/R application)
                coarse_part = natural_part
            if algorithm == "AGGREGATION":
                ac = dsetup.dist_aggregation_galerkin(swork, agg,
                                                      natural_part)
                ac = dsetup.consolidate_sharded(ac, coarse_part)
                sr = dsetup.dist_transpose(sp_, coarse_part)
            else:
                ac, sr = dsetup.dist_classical_galerkin(swork, sp_,
                                                        coarse_part)
            info["cpart"] = coarse_part
            lvl = self.levels[-1]
            lvl.p = DistEllMatrix.from_shards(
                sp_.blocks(), fine_part, coarse_part, swork.n_rows, nc,
                dtype=mat_dt, mesh=self.mesh, axis=self.axis,
                sort_interior_first=False, block_dim=sp_.block_dim)
            lvl.r = DistEllMatrix.from_shards(
                sr.blocks(), coarse_part, fine_part, nc, swork.n_rows,
                dtype=mat_dt, mesh=self.mesh, axis=self.axis,
                sort_interior_first=False, block_dim=sr.block_dim)
            ad = DistEllMatrix.from_shards(
                ac.blocks(), coarse_part, coarse_part, nc, nc,
                dtype=mat_dt, mesh=self.mesh, axis=self.axis,
                sort_interior_first=False, block_dim=ac.block_dim)
            self.levels.append(DistLevel(
                ad, self._inv_diag_sharded(ac, ad, vec_dt, self.mesh,
                                           self.axis,
                                           l1=self._smoother_l1)))
            self._attach_smoother_level(self.levels[-1], ac, ad, vec_dt)
            if self.cheby_smoothing:
                self._cheby_bounds.append(self._lambda_bounds_sharded(ac))
            self._structure.append(info)
            self._sharded_ops.append(ac)
            swork = ac

    @staticmethod
    def _inv_diag_sharded(sm, dm: DistEllMatrix, dtype, mesh=None,
                          axis: str = "x", l1: bool = False):
        """Per-shard inverse diagonal in the stacked (D, Lr) layout —
        touches owned rows only (distributed AMG levels keep natural row
        order, so no interior-first permutation applies). l1=True adds the
        off-diagonal L1 row sums (JACOBI_L1 smoothing; row-local, so no
        exchange is needed)."""
        host_dt = np.complex128 if np.issubdtype(
            np.dtype(dtype), np.complexfloating) else np.float64
        bx = sm.block_dim[0]
        rows_by_dev = {}
        for dev, dg in enumerate(sm.diagonal()):
            if dg is None:                      # remote shard (partial)
                continue
            dg = np.asarray(dg, host_dt)
            if l1:
                s = sm.shards[dev]
                rows = np.repeat(np.arange(s.n_rows), s.row_nnz())
                r0 = int(sm.part.offsets[dev])
                off = s.indices.astype(np.int64) != rows + r0
                if bx == 1:
                    l1sum = np.zeros(s.n_rows)
                    np.add.at(l1sum, rows[off], np.abs(s.data[off]))
                    dg = dg + l1sum
                else:
                    l1sum = np.zeros((s.n_rows, bx))
                    np.add.at(l1sum, rows[off],
                              np.abs(s.data[off]).sum(axis=2))
                    dg = dg + np.einsum("ni,ij->nij", l1sum, np.eye(bx))
            if bx == 1:
                safe = np.where(dg == 0, 1.0, dg)
                row = np.ones(dm.lr, host_dt)
                row[:dg.shape[0]] = 1.0 / safe
            else:
                # batched block inverse; singular blocks fall back to
                # identity (the single-chip _inv_diag_arrays guard)
                dets = np.linalg.det(dg)
                bad = ~np.isfinite(dets) | (dets == 0)
                safe = np.where(bad[:, None, None], np.eye(bx), dg)
                inv = np.linalg.inv(safe)
                inv[bad] = np.eye(bx)
                row = np.tile(np.eye(bx), (dm.lr, 1, 1)).astype(
                    host_dt)
                row[:inv.shape[0]] = inv
            rows_by_dev[dev] = row.astype(dtype)
        shape = (dm.lr,) if bx == 1 else (dm.lr, bx, bx)
        if mesh is not None:
            from .multihost import put_stacked
            return put_stacked(rows_by_dev, dm.n_dev, shape,
                               np.dtype(dtype), mesh, axis)
        out = np.ones((dm.n_dev,) + shape, host_dt)
        if bx > 1:
            out = np.tile(np.eye(bx), (dm.n_dev, dm.lr, 1, 1))
        out = out.astype(dtype)
        for dev, row in rows_by_dev.items():
            out[dev] = row
        return jnp.asarray(out)

    def _set_dilu_level(self, lvl, source, dm, vec_dt) -> None:
        """Attach multicolor-DILU data to a level: shard-parallel JP
        coloring + E-factorization (dist_color/dist_dilu_factor, exact
        single-chip parity), stacked (D, Lr) and device-sharded. ``source``
        is the level's operator as a global CSR or a (possibly partial)
        ShardedCSR."""
        from . import setup as dsetup
        from .multihost import put_stacked
        sm = source if hasattr(source, "shards") else \
            dsetup.ShardedCSR.from_global(source, dm.row_part)
        colors, nc = dsetup.dist_color(sm)
        e_sh, ie_sh = dsetup.dist_dilu_factor(sm, colors, nc)
        _ = e_sh                      # apply needs only invE (invE*E == 1
        #                               on the nonsingular rows; singular
        #                               rows match the single-chip guard)
        bx = sm.block_dim[0] if hasattr(sm, "block_dim") else 1
        lr = dm.lr
        inv_shape = (lr,) if bx == 1 else (lr, bx, bx)
        inv_by, col_by = {}, {}
        for d in range(sm.n_dev):
            if ie_sh[d] is None:
                continue
            row = np.zeros(inv_shape, np.dtype(vec_dt))
            if bx > 1:
                row[:] = np.eye(bx)       # padded rows: identity blocks
            row[:ie_sh[d].shape[0]] = ie_sh[d].astype(np.dtype(vec_dt))
            crow = np.full(lr * bx, -1, np.int32)
            cd = np.repeat(colors[d], bx) if bx > 1 else colors[d]
            crow[:cd.shape[0]] = cd
            inv_by[d] = row
            col_by[d] = crow
        if self.mesh is not None:
            inv_dev = put_stacked(inv_by, sm.n_dev, inv_shape,
                                  np.dtype(vec_dt), self.mesh, self.axis)
            col_dev = put_stacked(col_by, sm.n_dev, (lr * bx,),
                                  np.dtype(np.int32), self.mesh,
                                  self.axis)
        else:
            inv_np = np.zeros((sm.n_dev,) + inv_shape, vec_dt)
            col_np = np.full((sm.n_dev, lr * bx), -1, np.int32)
            for d, v in inv_by.items():
                inv_np[d], col_np[d] = v, col_by[d]
            inv_dev, col_dev = jnp.asarray(inv_np), jnp.asarray(col_np)
        lvl.dilu = (inv_dev, col_dev)
        lvl.dilu_nc = nc
        if getattr(self, "_color_local", False):
            if bx > 1:
                raise NotImplementedError(
                    "distributed BSR MULTICOLOR_DILU supports "
                    "boundary_coloring=SYNC_COLORS only")
            lvl.dilu_tri, lvl.dilu_tri_static = self._color_tri_ops(
                lvl, sm, dm, colors, vec_dt)

    def _attach_smoother_level(self, lvl, source, dm, vec_dt) -> None:
        """Attach whatever per-level smoother data the configured smoother
        / preconditioner needs (one call site per level-construction path
        so every smoother works on every setup route)."""
        if getattr(self, "_dilu", False):
            self._set_dilu_level(lvl, source, dm, vec_dt)
        if getattr(self, "_gs2", False):
            lvl.gs = self._gs_tri_ops(
                self._gs_shard_rows(source, dm.row_part), lvl, vec_dt)
        if getattr(self, "_mcgs", False):
            self._set_mcgs_level(lvl, source, dm, vec_dt)
        if getattr(self, "_milu", False):
            self._set_milu_level(lvl, source, dm, vec_dt)
        if getattr(self, "_kacz", False):
            self._set_kacz_level(lvl, source, dm, vec_dt)

    def _stack_colors(self, colors, sm, dm, vec_dt, bx: int = 1):
        """Stack per-shard color arrays into the (D, Lr*bx) device form
        (block rows expand to bx scalar slots so the color mask aligns
        with flat block vectors — mirror of the single-chip
        GaussSeidelSolver np.repeat(color, bx))."""
        from .multihost import put_stacked
        lr = dm.lr * bx
        col_by = {}
        for d in range(sm.n_dev):
            if colors[d] is None:
                continue
            crow = np.full(lr, -1, np.int32)
            cd = np.repeat(colors[d], bx) if bx > 1 else colors[d]
            crow[:cd.shape[0]] = cd
            col_by[d] = crow
        if self.mesh is not None:
            return put_stacked(col_by, sm.n_dev, (lr,), np.dtype(np.int32),
                               self.mesh, self.axis)
        col_np = np.full((sm.n_dev, lr), -1, np.int32)
        for d, v in col_by.items():
            col_np[d] = v
        return jnp.asarray(col_np)

    def _level_colors(self, sm):
        """Per-shard row colors: shard-parallel JP (dist_color) or the
        FIXCOLOR_GS round-robin 4-coloring on global row ids
        (fixcolor_gauss_seidel_solver.cu)."""
        from . import setup as dsetup
        if getattr(self, "_mcgs_fix4", False):
            colors = [None if sm.shards[d] is None else
                      ((np.arange(sm.shards[d].n_rows, dtype=np.int64)
                        + int(sm.part.offsets[d])) % 4).astype(np.int32)
                      for d in range(sm.n_dev)]
            return colors, 4
        return dsetup.dist_color(sm)

    def _color_tri_ops(self, lvl, sm, dm, colors, vec_dt):
        """Shard-local strict lower/upper *by color rank* triangles of the
        level operator (boundary_coloring != SYNC_COLORS): inside a color
        solve, (A z)_c == (L z)_c exactly when z is supported on earlier
        colors, so the masked full-A apply is replaced by these local
        triangles — one halo exchange per sweep instead of per color.
        Cross-shard couplings stay in the outer residual (the reference's
        relaxed boundary-coloring semantics, core.cu:372-377)."""
        shard_rows = self._gs_shard_rows(sm, dm.row_part)
        ent, local_devs, partial = self._slot_entries(shard_rows, lvl)
        perm = getattr(lvl.a, "row_perm", None)
        slotcol = {}
        for d in local_devs:
            c = np.full(dm.lr, -1, np.int64)
            cd = np.asarray(colors[d], np.int64)
            if perm is not None:
                pd = np.asarray(perm[d])
                ok = pd >= 0
                r0 = int(dm.row_part.offsets[d])
                c[np.nonzero(ok)[0]] = cd[pd[ok] - r0]
            else:
                c[:cd.shape[0]] = cd
            slotcol[d] = c
        low, lo_offs = self._pack_tri(
            ent, local_devs, partial, dm.n_dev, dm.lr, vec_dt,
            lambda d, sr, sc: slotcol[d][sc] < slotcol[d][sr])
        up, up_offs = self._pack_tri(
            ent, local_devs, partial, dm.n_dev, dm.lr, vec_dt,
            lambda d, sr, sc: slotcol[d][sc] > slotcol[d][sr])
        return (low, up), (lo_offs, up_offs)

    def _set_mcgs_level(self, lvl, source, dm, vec_dt) -> None:
        """Multicolor / fixed-color Gauss-Seidel level data: colors (+
        local triangles when boundary_coloring allows)."""
        from . import setup as dsetup
        sm = source if hasattr(source, "shards") else \
            dsetup.ShardedCSR.from_global(source, dm.row_part)
        colors, nc = self._level_colors(sm)
        bx = sm.block_dim[0] if hasattr(sm, "block_dim") else 1
        lvl.mcolor = self._stack_colors(colors, sm, dm, vec_dt, bx=bx)
        lvl.mcolor_nc = nc
        if getattr(self, "_color_local", False):
            if bx > 1:
                raise NotImplementedError(
                    "distributed BSR multicolor GS supports "
                    "boundary_coloring=SYNC_COLORS only")
            lvl.mcgs_tri, lvl.mcgs_tri_static = self._color_tri_ops(
                lvl, sm, dm, colors, vec_dt)

    def _set_milu_level(self, lvl, source, dm, vec_dt) -> None:
        """Multicolor ILU(k) level data (multicolor_ilu_solver.cu): each
        shard factorizes its owned diagonal block in its color ordering
        (hybrid block-Jacobi ILU — cross-shard couplings stay in the outer
        residual; the reference's non-SYNC halo_coloring semantics). The
        triangular solves then run as color-masked updates over
        shard-local L/U packs — one collective per sweep."""
        from . import setup as dsetup
        from .multihost import put_stacked
        from ..solvers.multicolor import ilu0_factor_host
        from ..matrix import CSRMatrix as _CSR
        sm = source if hasattr(source, "shards") else \
            dsetup.ShardedCSR.from_global(source, dm.row_part)
        colors, nc = dsetup.dist_color(sm)
        lvl.milu_color = self._stack_colors(colors, sm, dm, vec_dt)
        lvl.milu_nc = nc
        level_k = int(self.cfg.get("ilu_sparsity_level", self._milu_scope))
        lr = dm.lr
        local_devs = [d for d in range(sm.n_dev)
                      if sm.shards[d] is not None]
        rows_L, rows_U = [], []
        inv_ud_by = {}
        for d in range(sm.n_dev):
            if sm.shards[d] is None:
                rows_L.append(None)
                rows_U.append(None)
                continue
            s = sm.shards[d]
            r0 = int(sm.part.offsets[d])
            r1 = int(sm.part.offsets[d + 1])
            n = s.n_rows
            rows = np.repeat(np.arange(n, dtype=np.int64), s.row_nnz())
            own = (s.indices >= r0) & (s.indices < r1)
            data = s.data if s.block_dim == (1, 1) else s.data[:, 0, 0]
            loc = _CSR.from_coo(n, n, rows[own],
                                (s.indices[own] - r0).astype(np.int64),
                                np.real(data[own]).astype(np.float64),
                                sum_duplicates=False)
            work = loc
            if level_k >= 1:
                from ..ops.spgemm import sparsity_ilu1
                work = sparsity_ilu1(loc)
            col = colors[d]
            perm = np.argsort(col, kind="stable")
            rank = np.empty(n, np.int64)
            rank[perm] = np.arange(n)
            dataf = ilu0_factor_host(work.indptr, work.indices, work.data,
                                     rank, perm)
            rows_w = np.repeat(np.arange(n, dtype=np.int64),
                               np.diff(work.indptr))
            cols_w = work.indices.astype(np.int64)
            lower = rank[cols_w] < rank[rows_w]
            rows_L.append((rows_w[lower] + r0, cols_w[lower] + r0,
                           dataf[lower]))
            rows_U.append((rows_w[~lower] + r0, cols_w[~lower] + r0,
                           dataf[~lower]))
            ud = np.ones(lr)
            dmask = (cols_w == rows_w) & (dataf != 0)
            ud[rows_w[dmask]] = dataf[dmask]
            inv_ud_by[d] = (1.0 / ud).astype(np.dtype(vec_dt))
        entL, _, partial = self._slot_entries(rows_L, lvl)
        entU, _, _ = self._slot_entries(rows_U, lvl)
        every = lambda d, sr, sc: np.ones(sr.shape[0], bool)
        Ltri, lo_offs = self._pack_tri(entL, local_devs, partial, dm.n_dev,
                                       lr, vec_dt, every)
        Utri, up_offs = self._pack_tri(entU, local_devs, partial, dm.n_dev,
                                       lr, vec_dt, every)
        if self.mesh is not None:
            inv_ud = put_stacked(inv_ud_by, sm.n_dev, (lr,),
                                 np.dtype(vec_dt), self.mesh, self.axis)
        else:
            arr = np.ones((sm.n_dev, lr), vec_dt)
            for d, v in inv_ud_by.items():
                arr[d] = v
            inv_ud = jnp.asarray(arr)
        lvl.milu = (Ltri, Utri, inv_ud)
        lvl.milu_static = (lo_offs, up_offs)

    def _set_kacz_level(self, lvl, source, dm, vec_dt) -> None:
        """Kaczmarz level data (kaczmarz_solver.cu): the transposed
        operator A^T as a second sharded SpMV operand (row projections
        apply through A^T), per-row inverse squared norms, and — in
        multicolor mode (kaczmarz_coloring_needed=1) — a per-shard
        distance-2 coloring of the owned diagonal block, so same-color
        rows within a shard touch disjoint columns (exact simultaneous
        projections; cross-shard same-color overlap follows the relaxed
        boundary-coloring semantics like the other hybrid smoothers).
        Without coloring, the damped simultaneous (Cimmino) projection is
        exact distributed — no coloring dependence at all."""
        from . import setup as dsetup
        from .multihost import put_stacked
        sm = source if hasattr(source, "shards") else \
            dsetup.ShardedCSR.from_global(source, dm.row_part)
        # natural slot order required (col_perm is set only by the
        # interior-first reorder, which the setup gate disables for
        # KACZMARZ levels)
        assert getattr(dm, "col_perm", None) is None, \
            "KACZMARZ levels are built with natural row order"
        at = dsetup.dist_transpose(sm, sm.part)
        lvl.kacz_at_dm = DistEllMatrix.from_shards(
            at.blocks(), sm.part, sm.part, sm.n_rows, sm.n_cols,
            dtype=np.dtype(vec_dt), mesh=self.mesh, axis=self.axis,
            sort_interior_first=False)
        lr = dm.lr
        use_coloring = bool(self.cfg.get("kaczmarz_coloring_needed",
                                         self._kacz_scope))
        inv_by, col_by = {}, {}
        nc = 0
        max_deg = 0
        for d in sm.devs:
            s = sm.shards[d]
            r0 = int(sm.part.offsets[d])
            r1 = int(sm.part.offsets[d + 1])
            n_loc = s.n_rows
            rows = np.repeat(np.arange(n_loc, dtype=np.int64),
                             s.row_nnz())
            data = np.real(s.data if s.block_dim == (1, 1)
                           else s.data[:, 0, 0]).astype(np.float64)
            rn = np.zeros(lr)
            np.add.at(rn, rows, np.abs(data) ** 2)
            row = np.zeros(lr, np.dtype(vec_dt))
            nzr = rn != 0
            row[nzr] = (1.0 / rn[nzr]).astype(np.dtype(vec_dt))
            inv_by[d] = row
            max_deg = max(max_deg, int(s.row_nnz().max()) if n_loc else 0)
            if use_coloring:
                from ..coloring import color_matrix
                from ..matrix import CSRMatrix as _CSR
                own = (s.indices >= r0) & (s.indices < r1)
                loc = _CSR.from_coo(
                    n_loc, n_loc, rows[own],
                    (s.indices[own] - r0).astype(np.int64), data[own],
                    sum_duplicates=False)
                coloring = color_matrix(loc, "MIN_MAX_2RING")
                crow = np.full(lr, -1, np.int32)
                crow[:n_loc] = coloring.colors
                col_by[d] = crow
                nc = max(nc, int(coloring.num_colors))
        if sm.is_partial:
            nc = int(dsetup._mh_scalar(True, float(nc)))
            max_deg = int(dsetup._mh_scalar(True, float(max_deg)))
        if self.mesh is not None:
            inv_dev = put_stacked(inv_by, sm.n_dev, (lr,),
                                  np.dtype(vec_dt), self.mesh, self.axis)
            col_dev = put_stacked(col_by, sm.n_dev, (lr,),
                                  np.dtype(np.int32), self.mesh,
                                  self.axis) if use_coloring else None
        else:
            inv_np = np.zeros((sm.n_dev, lr), vec_dt)
            col_np = np.full((sm.n_dev, lr), -1, np.int32)
            for d, v in inv_by.items():
                inv_np[d] = v
                if use_coloring:
                    col_np[d] = col_by[d]
            inv_dev = jnp.asarray(inv_np)
            col_dev = jnp.asarray(col_np) if use_coloring else None
        lvl.kacz = (inv_dev, col_dev)
        lvl.kacz_nc = nc if use_coloring else 0
        lvl.kacz_damp = 1.0 if use_coloring else 1.0 / max(1, max_deg)

    @staticmethod
    def _lambda_bounds_sharded(sm, iters: int = 12):
        """Power-iteration lambda_max(D^-1 A) from per-shard rows
        (chebyshev_lambda_estimate_mode 0, cheb_solver.cu): each shard
        multiplies only its owned rows; only the length-N iteration vector
        is global — no global operator assembly."""
        import scipy.sparse as sp
        if sm.is_partial:
            return DistributedSolver._lambda_bounds_sharded_mp(sm, iters)
        mats, dparts, dds = [], [], []
        for s in sm.shards:
            data = s.data if s.block_dim == (1, 1) else s.data[:, 0, 0]
            mats.append(sp.csr_matrix((data, s.indices, s.indptr),
                                      shape=(s.n_rows, sm.n_cols)))
            dds.append(None if s.diag_data is None else
                       (s.diag_data if s.block_dim == (1, 1)
                        else s.diag_data[:, 0, 0]))
        d = np.concatenate(sm.diagonal()) if sm.n_rows else np.zeros(0)
        if d.ndim > 1:
            d = d[:, 0, 0]
        d = np.where(d == 0, 1.0, d)
        rng = np.random.default_rng(7)
        v = rng.standard_normal(sm.n_rows)
        lam = 1.0
        offs = sm.part.offsets
        for _ in range(iters):
            parts = []
            for i, m in enumerate(mats):
                w = m @ v
                if dds[i] is not None:
                    w = w + dds[i] * v[int(offs[i]):int(offs[i + 1])]
                parts.append(w)
            w = np.concatenate(parts) / d
            lam = float(np.linalg.norm(w))
            if lam == 0:
                return 1.0, 0.125
            v = w / lam
        lam *= 1.05                      # safety margin
        return lam, lam / 8.0

    @staticmethod
    def _lambda_bounds_sharded_mp(sm, iters: int = 12):
        """Rank-local power iteration for partial (multi-process) shards:
        the length-N/P iteration-vector slices stay per process; each sweep
        exchanges only halo values + one scalar norm all-reduce. The init
        vector differs from the single-process standard_normal draw (PCG64
        uniform slices advance per row, Gaussians don't), which only
        perturbs the lambda_max estimate, not solve correctness."""
        import math
        from . import setup as dsetup
        devs = sm.devs
        halos = [None if sm.shards[d] is None else sm.halo_cols(d)
                 for d in range(sm.n_dev)]
        exts = {d: dsetup.extended_local(sm, d)[0] for d in devs}
        diags = sm.diagonal()
        v = {}
        for d in devs:
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            g = np.random.Generator(np.random.PCG64(7).advance(r0))
            v[d] = g.random(r1 - r0) - 0.5
        lam = 1.0
        for _ in range(iters):
            g_v = dsetup.exchange_col_values(
                sm.part, [v.get(d) for d in range(sm.n_dev)], halos)
            sq = 0.0
            w = {}
            for d in devs:
                ext = exts[d]
                data = ext.data if ext.block_dim == (1, 1) else \
                    ext.data[:, 0, 0]
                ve = np.concatenate([v[d], g_v[d]]) if halos[d].size \
                    else v[d]
                rows = np.repeat(np.arange(ext.n_rows), ext.row_nnz())
                wd = np.zeros(ext.n_rows, np.result_type(data.dtype,
                                                         np.float64))
                np.add.at(wd, rows, data * ve[ext.indices])
                dg = np.asarray(diags[d])
                if dg.ndim > 1:
                    dg = dg[:, 0, 0]
                wd = wd / np.where(dg == 0, 1.0, dg)
                w[d] = wd
                sq += float(np.vdot(wd, wd).real)
            lam = math.sqrt(dsetup._mh_scalar(True, sq, op=sum))
            if lam == 0:
                return 1.0, 0.125
            for d in devs:
                v[d] = w[d] / lam
        lam *= 1.05
        return lam, lam / 8.0

    @staticmethod
    def _lambda_bounds(csr: CSRMatrix, iters: int = 12):
        """Power-iteration estimate of lambda_max(D^-1 A) (reference:
        chebyshev_lambda_estimate_mode 0, cheb_solver.cu); lambda_min is
        the usual lambda_max/8 smoothing window."""
        a = csr.to_scipy().tocsr()      # scalar-expanded for BSR
        d = a.diagonal()
        d = np.where(d == 0, 1.0, d)
        rng = np.random.default_rng(7)
        v = rng.standard_normal(a.shape[0])
        lam = 1.0
        for _ in range(iters):
            w = (a @ v) / d
            lam = float(np.linalg.norm(w))
            if lam == 0:
                return 1.0, 0.125
            v = w / lam
        lam *= 1.05                      # safety margin
        return lam, lam / 8.0

    def _cheby_smooth(self, a_args, static, inv_diag, bounds, b, x,
                      order: int):
        """Chebyshev polynomial smoothing on [lambda_min, lambda_max] of
        D^-1 A: only SpMV + axpy, the TPU-optimal smoother (reference:
        cheb_solver.cu / chebyshev_poly.cu)."""
        lam_max, lam_min = bounds
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)
        sigma = theta / delta
        rho = 1.0 / sigma
        r = b - self._apply_mat(a_args, x, static)
        p = self._invd_mul(inv_diag, r) / theta
        x = x + p
        for _ in range(order - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = b - self._apply_mat(a_args, x, static)
            p = (rho_new * rho) * p + (2.0 * rho_new / delta) * \
                self._invd_mul(inv_diag, r)
            x = x + p
            rho = rho_new
        return x

    def _build_coarse_dense(self, vec_dt) -> None:
        """Replicated coarsest-level dense LU (consolidate-to-all)."""
        n_dev = self.mesh.devices.size
        if getattr(self, "_sharded_setup", False):
            # coarsest-level assembly only: O(coarse rows), the replicate-
            # to-all consolidation step (amg.cu dense-LU coarse solve)
            coarsest = self._sharded_ops[-1].to_global()
        else:
            coarsest = self._global_csrs[-1]
        host_dt = np.complex128 if np.issubdtype(
            coarsest.data.dtype, np.complexfloating) else np.float64
        dense = coarsest.to_dense().astype(host_dt)   # scalar-expanded
        lvl = self.levels[-1]
        bx = lvl.a.block_dim[0]
        lr = lvl.a.lr * bx            # scalar rows per shard slot
        n_pad = lr * n_dev
        full = np.eye(n_pad, dtype=host_dt)
        # rows live blocked per device: global slot = d * lr + local
        gmap = np.full(n_pad, -1, np.int64)
        for d in range(n_dev):
            r0, r1 = lvl.a.row_part.offsets[d] * bx, \
                lvl.a.row_part.offsets[d + 1] * bx
            gmap[d * lr:(d * lr) + (r1 - r0)] = np.arange(r0, r1)
        ok = gmap >= 0
        sub = np.ix_(ok, ok)
        full[sub] = dense[np.ix_(gmap[ok], gmap[ok])]
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(full)
        from .multihost import put_replicated
        lvl.coarse_dense = (put_replicated(lu.astype(vec_dt), self.mesh),
                            put_replicated(piv.astype(np.int32),
                                           self.mesh))

    def resetup(self, csr: Optional[CSRMatrix] = None) -> None:
        """Coefficients changed, structure kept (reference:
        AMGX_solver_resetup + structure_reuse_levels, amg.cu:260-290):
        partitions, aggregate maps and transfer structures are reused;
        only operator values, smoother data and the coarse factorization
        are recomputed. Falls back to full setup when no hierarchy exists."""
        if not self.levels:
            return self.setup(csr)
        csr = csr if csr is not None else self._user_csr0
        if hasattr(csr, "shards"):
            # rank-local entry: structure reuse across resetups is not yet
            # wired for partial shards — rerun the (O(N/P)) full setup
            return self.setup(csr)
        self._user_csr0 = csr
        csr = self._apply_scaling(csr)
        t0 = time.perf_counter()
        vec_dt, mat_dt = mode_dtypes(self.mode)
        n_dev = self.mesh.devices.size
        lvl0 = self.levels[0]
        a0 = DistEllMatrix.from_global(
            csr, n_dev, lvl0.a.row_part, dtype=mat_dt, mesh=self.mesh,
            axis=self.axis, sort_interior_first=self._split0 > 0)
        lvl0.a = a0
        lvl0.inv_diag = self._inv_diag(
            csr, a0, vec_dt, self.mesh, self.axis,
            l1=getattr(self, "_l1_diag", False))
        self._attach_smoother_level(lvl0, csr, a0, vec_dt)
        cheby = getattr(self, "cheby_smoothing", False)
        if getattr(self, "_sharded_setup", False):
            # shard-parallel re-coarsening: reuse partitions and transfer
            # structure, recompute operator values per shard (O(N/P) each)
            from . import setup as dsetup
            sm = dsetup.ShardedCSR.from_global(csr, lvl0.a.row_part)
            self._sharded_ops = [sm]
            if cheby:
                self._cheby_bounds = [self._lambda_bounds_sharded(sm)]
            for i, lvl in enumerate(self.levels[:-1]):
                info = self._structure[i]
                coarse_part = info["cpart"]
                if info["agg"] is not None:
                    ac = dsetup.dist_aggregation_galerkin(
                        sm, info["agg"], info["natpart"])
                    ac = dsetup.consolidate_sharded(ac, coarse_part)
                else:
                    ac, _ = dsetup.dist_classical_galerkin(
                        sm, info["p"], coarse_part)
                nxt = self.levels[i + 1]
                ad = DistEllMatrix.from_shards(
                    ac.blocks(), coarse_part, coarse_part, ac.n_rows,
                    ac.n_cols, dtype=mat_dt, mesh=self.mesh,
                    axis=self.axis, sort_interior_first=False,
                    block_dim=ac.block_dim)
                nxt.a = ad
                nxt.inv_diag = self._inv_diag_sharded(
                    ac, ad, vec_dt, self.mesh, self.axis,
                    l1=getattr(self, "_smoother_l1", False))
                self._attach_smoother_level(nxt, ac, ad, vec_dt)
                if cheby:
                    self._cheby_bounds.append(
                        self._lambda_bounds_sharded(ac))
                self._sharded_ops.append(ac)
                sm = ac
            if self.levels[-1].coarse_dense is not None:
                self._build_coarse_dense(vec_dt)
            self._build_step()
            self.setup_time = time.perf_counter() - t0
            return
        if cheby:
            self._cheby_bounds = [self._lambda_bounds(csr)]
        work = csr
        new_csrs = [csr]
        for i, lvl in enumerate(self.levels[:-1]):
            info = self._structure[i]
            if info["agg"] is not None:
                from ..ops.spgemm import aggregation_galerkin
                ac = aggregation_galerkin(work, info["agg"], info["nc"])
            else:
                from ..ops.spgemm import galerkin_product
                ac = galerkin_product(info["r_csr"], work, info["p_csr"])
            nxt = self.levels[i + 1]
            coarse_part = nxt.a.row_part
            ad = DistEllMatrix.from_global(
                ac, n_dev, coarse_part, coarse_part, dtype=mat_dt,
                mesh=self.mesh, axis=self.axis, sort_interior_first=False)
            nxt.a = ad
            nxt.inv_diag = self._inv_diag(
                ac, ad, vec_dt, self.mesh, self.axis,
                l1=getattr(self, "_smoother_l1", False))
            self._attach_smoother_level(nxt, ac, ad, vec_dt)
            if cheby:
                self._cheby_bounds.append(self._lambda_bounds(ac))
            work = ac
            new_csrs.append(ac)
        self._global_csrs = new_csrs
        if self.levels[-1].coarse_dense is not None:
            self._build_coarse_dense(vec_dt)
        self._build_step()
        self.setup_time = time.perf_counter() - t0

    def _shard_local_aggregates(self, csr: CSRMatrix, part: RowPartition,
                                selector: str, scope: str):
        """Aggregate each shard's diagonal block independently (reference:
        distributed aggregation — setAggregates runs per rank on owned rows,
        aggregation_amg_level.cu:1986; aggregates never span ranks).
        Returns (global agg map, n_coarse, coarse RowPartition aligned with
        the fine shards)."""
        from ..amg.aggregation import select_aggregates
        agg = np.full(csr.n_rows, -1, np.int64)
        offsets = [0]
        base = 0
        rn = csr.row_nnz()
        for d in range(part.n_dev):
            r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
            if r1 > r0:
                # diagonal sub-block by direct (block-)CSR slicing — keeps
                # BSR block values intact (scipy round trips would expand)
                s, e = int(csr.indptr[r0]), int(csr.indptr[r1])
                idx = csr.indices[s:e]
                keep = (idx >= r0) & (idx < r1)
                rows = np.repeat(np.arange(r1 - r0), rn[r0:r1])
                counts = np.bincount(rows[keep], minlength=r1 - r0)
                sub_indptr = np.concatenate(
                    [[0], np.cumsum(counts)]).astype(csr.indptr.dtype)
                bm = CSRMatrix(r1 - r0, r1 - r0, sub_indptr,
                               (idx[keep] - r0).astype(csr.indices.dtype),
                               csr.data[s:e][keep],
                               block_dim=csr.block_dim,
                               diag_data=None if csr.diag_data is None
                               else csr.diag_data[r0:r1])
                agg_d, nc_d = select_aggregates(bm, selector, self.cfg,
                                                scope)
                agg[r0:r1] = np.where(agg_d >= 0, base + agg_d, -1)
                base += nc_d
            offsets.append(base)
        return agg, base, RowPartition(np.asarray(offsets, np.int64))

    @staticmethod
    def _inv_diag(csr: CSRMatrix, dm: DistEllMatrix, dtype, mesh=None,
                  axis: str = "x", l1: bool = False):
        host_dt = np.complex128 if np.issubdtype(
            csr.data.dtype, np.complexfloating) else np.float64
        d = csr.diagonal().astype(host_dt)
        bx = csr.block_dim[0]
        if l1:
            # JACOBI_L1 (jacobi_l1_solver.cu): off-diagonal L1 row sums
            # added onto the (block) diagonal, per component for BSR
            n = csr.n_rows
            rows = np.repeat(np.arange(n), csr.row_nnz())
            off = csr.indices != rows
            if bx == 1:
                l1sum = np.zeros(n)
                np.add.at(l1sum, rows[off], np.abs(csr.data[off]))
                d = d + l1sum
            else:
                l1sum = np.zeros((n, bx))
                np.add.at(l1sum, rows[off],
                          np.abs(csr.data[off]).sum(axis=2))
                d = d + np.einsum("ni,ij->nij", l1sum, np.eye(bx))
        if bx == 1:
            safe = np.where(d == 0, 1.0, d)
            inv_g = (1.0 / safe).astype(dtype)
            return dm.scatter_vector(inv_g, "rows", mesh, axis)
        # batched inverse with identity substituted for singular blocks
        dets = np.linalg.det(d)
        bad = ~np.isfinite(dets) | (dets == 0)
        safe = np.where(bad[:, None, None], np.eye(bx), d)
        inv = np.linalg.inv(safe)
        inv[bad] = np.eye(bx)
        # stacked per shard: (D, Lr, bx, bx)
        out = np.tile(np.eye(bx), (dm.n_dev, dm.lr, 1, 1)).astype(dtype)
        for dev in range(dm.n_dev):
            r0, r1 = dm.row_part.offsets[dev], dm.row_part.offsets[dev + 1]
            out[dev, :r1 - r0] = inv[r0:r1]
        if mesh is not None:
            from .multihost import put_sharded
            return put_sharded(out, mesh, axis)
        return jnp.asarray(out)

    # -- stats (reference: amg.cu getGridStatisticsString; distributed runs
    # print the same table, plus our active-shard column) --------------------

    def grid_stats_string(self) -> str:
        lines = ["AMG Grid:",
                 f"         Number of Levels: {len(self.levels)}",
                 f"{'LVL':>12s} {'ROWS':>12s} {'NNZ':>14s} {'SPRSTY':>10s}"
                 f" {'SHARDS':>8s}"]
        lines.append("         " + "-" * 60)
        total_rows = total_nnz = 0
        for i, lvl in enumerate(self.levels):
            n, nnz = lvl.a.n_rows, lvl.a.nnz
            total_rows += n
            total_nnz += nnz
            active = int(np.sum(np.diff(lvl.a.row_part.offsets) > 0))
            sp = nnz / max(1, n * n)
            lines.append(f"{i:>12d} {n:>12d} {nnz:>14d} {sp:>10.3g}"
                         f" {active:>8d}")
        fine = self.levels[0]
        lines.append("         " + "-" * 60)
        lines.append(f"     Grid Complexity: "
                     f"{total_rows / max(1, fine.a.n_rows):.5g}")
        lines.append(f" Operator Complexity: "
                     f"{total_nnz / max(1, fine.a.nnz):.5g}")
        return "\n".join(lines)

    # -- SPMD building blocks -------------------------------------------------

    def _op(self, dm: DistEllMatrix):
        ax = self.axis

        def apply(cols, vals, pack, halo, x):
            return comms.dist_spmv(cols, vals, pack, halo, x, ax)
        return apply, (dm.cols, dm.vals, dm.pack_idx, dm.halo_from)

    def _slot_entries(self, shard_rows, lvl):
        """Shard-local owned-x-owned entries in the level's slot layout:
        returns (ent, local_devs, partial) with ent[d] = (slot_r, slot_c,
        vals)."""
        a = lvl.a
        part = a.row_part
        perm = getattr(a, "row_perm", None)
        n_dev = a.n_dev
        local_devs = [d for d in range(n_dev) if shard_rows[d] is not None]
        partial = len(local_devs) < n_dev
        ent = {}          # per local shard: (slot_r, slot_c, vals)
        for d in local_devs:
            rows_g, cols_g, vals = shard_rows[d]
            r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
            own = (cols_g >= r0) & (cols_g < r1)
            rows_g, cols_g, vals = rows_g[own], cols_g[own], vals[own]
            if perm is not None:
                inv = np.full(r1 - r0, -1, np.int64)
                pd = np.asarray(perm[d])
                ok = pd >= 0
                inv[pd[ok] - r0] = np.nonzero(ok)[0]
                sr = inv[rows_g - r0]
                sc = inv[cols_g - r0]
            else:
                sr = rows_g - r0
                sc = cols_g - r0
            ent[d] = (sr, sc, vals)
        return ent, local_devs, partial

    def _gs_tri_ops(self, shard_rows, lvl, vec_dt):
        """Shard-local strictly-triangular operators for hybrid two-stage
        GS smoothing in the level's slot layout (cross-shard couplings are
        excluded — the outer residual handles them, the standard hybrid-GS
        decomposition). ``shard_rows[d]`` = (rows_g, cols_g, vals) of shard
        d's owned rows with global ids. Returns ({'cols','vals'} lower,
        upper or None) stacked (D, Lr, W) and device-sharded."""
        a = lvl.a
        n_dev, lr = a.n_dev, a.lr
        ent, local_devs, partial = self._slot_entries(shard_rows, lvl)
        low, low_offs = self._pack_tri(ent, local_devs, partial, n_dev, lr,
                                       vec_dt, lambda d, sr, sc: sc < sr)
        up, up_offs = (self._pack_tri(ent, local_devs, partial, n_dev, lr,
                                      vec_dt, lambda d, sr, sc: sc > sr)
                       if self._gs2_symmetric else (None, None))
        lvl.gs_static = (low_offs, up_offs)
        return low, up

    def _pack_tri(self, ent, local_devs, partial, n_dev, lr, vec_dt, pick):
        """Pack a shard-local sub-operator selected by ``pick(d, sr, sc)``
        into the stacked device form — diagonal-offset (shift-FMA) bands
        when the selection is a few fixed diagonals in slot space (stencil
        levels; TPU gathers scalarize, shifts don't), ELL otherwise. The
        offset set and ELL width are global properties: tiny all-reduces
        in multi-process runs. Returns (opdict, offs-or-None) for
        ``_gs_tri_apply``."""
        from . import setup as dsetup
        from .multihost import allgather_host, put_stacked
        offs = set()
        for d in local_devs:
            sr, sc, _ = ent[d]
            m = pick(d, sr, sc)
            offs |= set(np.unique(sc[m] - sr[m]).tolist())
            if len(offs) > 12:
                break
        over = len(offs) > 12
        if partial:
            mine = np.asarray(sorted(offs), np.int64)
            offs = set()
            for o in allgather_host(mine):
                offs |= set(int(x) for x in o)
            over = dsetup._mh_scalar(True, float(over)) > 0 or \
                len(offs) > 12
        offs = tuple(sorted(int(o) for o in offs))
        if offs and not over and len(offs) <= 12:
            oix = {o: k for k, o in enumerate(offs)}
            rows_by = {}
            for d in local_devs:
                sr, sc, vv = ent[d]
                m = pick(d, sr, sc)
                # complex modes keep complex triangular values (round 5;
                # the shift-FMA/ELL applies below are dtype-generic)
                host_dt = np.complex128 if np.iscomplexobj(vv) \
                    else np.float64
                bands = np.zeros((len(offs), lr), host_dt)
                ks = np.asarray([oix[o] for o in (sc[m] - sr[m])],
                                np.int64) if m.any() else \
                    np.zeros(0, np.int64)
                bands[ks, sr[m]] = vv[m]
                rows_by[d] = bands.astype(vec_dt)
            return ({"bands": put_stacked(rows_by, n_dev,
                                          (len(offs), lr),
                                          np.dtype(vec_dt), self.mesh,
                                          self.axis)}, offs)
        w = 1
        for d in local_devs:
            sr, sc, _ = ent[d]
            m = pick(d, sr, sc)
            if m.any():
                w = max(w, int(np.bincount(sr[m], minlength=lr).max()))
        if partial:
            w = int(dsetup._mh_scalar(True, float(w)))
        cols_by, vals_by = {}, {}
        for d in local_devs:
            sr, sc, vv = ent[d]
            m = pick(d, sr, sc)
            cols = np.zeros((lr, w), np.int32)
            vals = np.zeros((lr, w),
                            np.complex128 if np.iscomplexobj(vv)
                            else np.float64)
            sr_m, sc_m, vv_m = sr[m], sc[m], vv[m]
            order = np.argsort(sr_m, kind="stable")
            sr_m, sc_m, vv_m = sr_m[order], sc_m[order], vv_m[order]
            first = np.searchsorted(sr_m, np.arange(lr))
            slot = np.arange(sr_m.size) - first[sr_m]
            cols[sr_m, slot] = sc_m
            vals[sr_m, slot] = vv_m
            cols_by[d] = cols
            vals_by[d] = vals.astype(vec_dt)
        return ({"cols": put_stacked(cols_by, n_dev, (lr, w),
                                     np.dtype(np.int32), self.mesh,
                                     self.axis),
                 "vals": put_stacked(vals_by, n_dev, (lr, w),
                                     np.dtype(vec_dt), self.mesh,
                                     self.axis)}, None)

    def _gs_shard_rows(self, source, part):
        """Per-shard (rows_g, cols_g, vals) COO of owned rows, from either
        a global CSRMatrix or a ShardedCSR."""
        out = []
        if hasattr(source, "shards"):                 # ShardedCSR
            for d in range(source.n_dev):
                s = source.shards[d]
                if s is None:                          # remote (partial)
                    out.append(None)
                    continue
                r0 = int(source.part.offsets[d])
                rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                                 s.row_nnz()) + r0
                data = s.data if s.block_dim == (1, 1) else s.data[:, 0, 0]
                out.append((rows, s.indices.astype(np.int64), data))
        else:                                          # global CSRMatrix
            csr = source
            rows_all = np.repeat(np.arange(csr.n_rows, dtype=np.int64),
                                 csr.row_nnz())
            data = csr.data if csr.block_dim == (1, 1) else \
                csr.data[:, 0, 0]
            for d in range(part.n_dev):
                r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
                p0, p1 = int(csr.indptr[r0]), int(csr.indptr[r1])
                out.append((rows_all[p0:p1],
                            csr.indices[p0:p1].astype(np.int64),
                            data[p0:p1]))
        return out

    @staticmethod
    def _gs_tri_apply(tri, offs, z):
        """Shard-local triangular apply: shift-FMA over fixed diagonal
        offsets when available (no gathers), ELL gather otherwise."""
        if offs is not None:
            acc = jnp.zeros_like(z)
            for k, off in enumerate(offs):
                if off < 0:
                    zs = jnp.concatenate(
                        [jnp.zeros(-off, z.dtype), z[:off]])
                elif off > 0:
                    zs = jnp.concatenate(
                        [z[off:], jnp.zeros(off, z.dtype)])
                else:
                    zs = z
                acc = acc + tri["bands"][k] * zs
            return acc
        return jnp.sum(tri["vals"] * z[tri["cols"]], axis=1)

    def _gs2_smooth(self, a_args, static, inv_diag, gs_low, gs_up,
                    gs_static, b, x):
        """Hybrid two-stage GS sweep (TWO_STAGE_GS, arXiv:2104.01196):
        the shard-local triangular solve approximated by inner Jacobi
        iterations — pure SpMV shape, no colors, no collectives beyond
        the outer residual."""
        low_offs, up_offs = gs_static

        def stage(r, tri, offs):
            z = self._invd_mul(inv_diag, r)
            for _ in range(self._gs2_inner):
                z = self._invd_mul(
                    inv_diag, r - self._gs_tri_apply(tri, offs, z))
            return z

        r = b - self._apply_mat(a_args, x, static)
        x = x + self.smooth_damp * stage(r, gs_low, low_offs)
        if gs_up:
            r = b - self._apply_mat(a_args, x, static)
            x = x + self.smooth_damp * stage(r, gs_up, up_offs)
        return x

    @staticmethod
    def _invd_mul(invd, r):
        """Apply a (stacked) inverse diagonal: elementwise for scalar,
        batched block solve via einsum for BSR ((Lr, bx, bx) blocks on a
        flat (Lr*bx,) vector)."""
        if invd.ndim == 3:
            bx = invd.shape[-1]
            return jnp.einsum("rij,rj->ri", invd,
                              r.reshape(-1, bx)).reshape(-1)
        return invd * r

    def _apply_mat(self, mat, v, static=None):
        """Apply one operand pytree (ELL, structured DIA, band, or BSR
        block form). ``static`` = (dia_offsets, margins, band_meta,
        nbr_perms)."""
        ax = self.axis
        blocked = mat["vals"].ndim == 4 if "vals" in mat else False
        if "pack" not in mat:
            # halo-free operator (shard-local P/R): no collective at all
            if blocked:
                by = mat["vals"].shape[-1]
                xb = v.reshape(-1, by)
                return jnp.einsum("rwij,rwj->ri", mat["vals"],
                                  xb[mat["cols"]]).reshape(-1)
            return jnp.sum(mat["vals"] * v[mat["cols"]], axis=1)
        offsets, margins, band_meta, perms = (
            static[:4] if static is not None else (None, None, None, None))
        gmeta = static[4] if static is not None and len(static) > 4 \
            else None
        if "g5" in mat:
            return comms.dist_spmv_gather(mat["g5"], gmeta, mat["pack"],
                                          mat["halo"], v, ax, perms=perms)
        if blocked:
            return comms.dist_spmv_block(mat["cols"], mat["vals"],
                                         mat["pack"], mat["halo"], v,
                                         mat["vals"].shape[-1], ax,
                                         perms=perms)
        if "bands" in mat:
            return comms.dist_spmv_structured(
                offsets, mat["bands"], margins,
                mat.get("halo_vals_top"), mat.get("halo_cols_top"),
                mat.get("halo_vals_bot"), mat.get("halo_cols_bot"),
                mat["pack"], mat["halo"], v, ax, perms=perms)
        if "strips" in mat:
            return comms.dist_spmv_band(
                mat["strips"], mat["base"], band_meta,
                mat.get("halo_vals_top"), mat.get("halo_cols_top"),
                mat.get("halo_vals_bot"), mat.get("halo_cols_bot"),
                mat["pack"], mat["halo"], v, ax, perms=perms)
        return comms.dist_spmv(mat["cols"], mat["vals"], mat["pack"],
                               mat["halo"], v, ax, perms=perms)

    def _vcycle(self, idx, b, x, lvl_args, cycle_type=None):
        """One multigrid cycle, fully inside the SPMD program. lvl_args[i] =
        (a_args, p_args, r_args, inv_diag, coarse_dense)."""
        ax = self.axis
        ctype = cycle_type or getattr(self, "cycle_type", "V")
        a_args, p_args, r_args, inv_diag, coarse = lvl_args[idx][:5]
        gs = lvl_args[idx][5] if len(lvl_args[idx]) > 5 else ((), ())
        dilu = lvl_args[idx][6] if len(lvl_args[idx]) > 6 else None
        dilu_tri = lvl_args[idx][7] if len(lvl_args[idx]) > 7 else None
        mcolor = lvl_args[idx][8] if len(lvl_args[idx]) > 8 else None
        mcgs_tri = lvl_args[idx][9] if len(lvl_args[idx]) > 9 else None
        milu_color = lvl_args[idx][10] if len(lvl_args[idx]) > 10 else None
        milu = lvl_args[idx][11] if len(lvl_args[idx]) > 11 else None
        kacz_at = lvl_args[idx][12] if len(lvl_args[idx]) > 12 else None
        kacz = lvl_args[idx][13] if len(lvl_args[idx]) > 13 else None
        static = self._level_static[idx]

        def spmv(args, v, st=None):
            return self._apply_mat(args, v, st)

        if idx == len(lvl_args) - 1:
            if coarse is not None:
                lu, piv = coarse
                rg = jax.lax.all_gather(b, ax).reshape(-1)
                sol = jax.scipy.linalg.lu_solve((lu, piv), rg)
                i = jax.lax.axis_index(ax)
                lr = b.shape[0]
                return jax.lax.dynamic_slice(sol, (i * lr,), (lr,))
            # Exact-to-tolerance coarse solve (reference always solves the
            # coarsest level exactly, cycles/cycle.h:53-59): Jacobi-
            # preconditioned CG under lax.while_loop instead of a fixed
            # handful of smoothing sweeps.
            return self._coarse_cg(a_args, static, inv_diag, b, x)
        cheby = getattr(self, "cheby_smoothing", False)
        gs2 = getattr(self, "_gs2", False) and gs[0]
        dl = getattr(self, "_dilu", False) and dilu
        mc = getattr(self, "_mcgs", False) and mcolor is not None
        il = getattr(self, "_milu", False) and milu is not None
        kz = getattr(self, "_kacz", False) and kacz is not None

        def smooth(x, sweeps):
            if cheby:
                return self._cheby_smooth(a_args, static, inv_diag,
                                          self._cheby_bounds[idx], b, x,
                                          self.cheby_order)
            for _ in range(sweeps):
                if dl:
                    x = self._dilu_smooth(
                        a_args, static, dilu, self._dilu_nc[idx], b, x,
                        tri=dilu_tri,
                        tri_static=self._dilu_tri_static[idx])
                elif mc:
                    x = self._mcgs_smooth(
                        a_args, static, inv_diag, mcolor,
                        self._mc_nc[idx], b, x, tri=mcgs_tri,
                        tri_static=self._mcgs_tri_static[idx])
                elif il:
                    x = self._milu_smooth(
                        a_args, static, milu, self._milu_static[idx],
                        milu_color, self._milu_nc[idx], b, x)
                elif kz:
                    x = self._kacz_smooth(
                        a_args, static, kacz_at, self._kacz_static[idx],
                        kacz, self._kacz_nc[idx], self._kacz_damp[idx],
                        b, x)
                elif gs2:
                    x = self._gs2_smooth(a_args, static, inv_diag, gs[0],
                                         gs[1], self._gs_static[idx], b, x)
                else:
                    x = x + self.smooth_damp * self._invd_mul(
                        inv_diag, b - spmv(a_args, x, static))
            return x

        x = smooth(x, self.presweeps)
        p_perms, r_perms = self._pr_perms[idx]
        r = b - spmv(a_args, x, static)
        rc = spmv(r_args, r, (None, None, None, r_perms))
        xc = jnp.zeros_like(rc)
        xc = self._vcycle(idx + 1, rc, xc, lvl_args, ctype)
        if ctype == "W":
            # W cycle: second identical coarse revisit (w_cycle.cu)
            xc = self._vcycle(idx + 1, rc, xc, lvl_args, "W")
        elif ctype == "F":
            # F cycle: F-then-V at each coarse level (f_cycle.cu), matching
            # the single-chip dispatcher in amg/cycles.py
            xc = self._vcycle(idx + 1, rc, xc, lvl_args, "V")
        x = x + spmv(p_args, xc, (None, None, None, p_perms))
        return smooth(x, self.postsweeps)

    def _dilu_smooth(self, a_args, static, dilu, nc, b, x,
                     tri=None, tri_static=(None, None)):
        """One multicolor-DILU smoothing step inside the SPMD program
        (multicolor_dilu_solver.cu; the reference's default AMG smoother):
        x += omega * (E+U)^-1 E (E+L)^-1 (b - A x), each triangular solve
        as nc color-sequential masked updates under lax.fori_loop.

        boundary_coloring=SYNC_COLORS (tri=None): every color step's SpMV
        carries its own halo exchange (core.cu:372-377), exact single-chip
        parity. Otherwise ``tri`` holds shard-local strict lower/upper
        by-color triangles — (A z)_c == (L z)_c for z supported on earlier
        colors, so the sweep costs one halo exchange total."""
        invE, color = dilu
        r = b - self._apply_mat(a_args, x, static)
        lo_offs, up_offs = tri_static

        def low_apply(z):
            if tri is not None:
                return self._gs_tri_apply(tri[0], lo_offs, z)
            return self._apply_mat(a_args, z, static)

        def up_apply(z):
            if tri is not None:
                return self._gs_tri_apply(tri[1], up_offs, z)
            return self._apply_mat(a_args, z, static)

        def fwd(c, z):
            az = low_apply(z)
            return jnp.where(color == c,
                             self._invd_mul(invE, r - az), z)

        z = jax.lax.fori_loop(0, nc, fwd, jnp.zeros_like(r))

        def bwd(i, xd):
            c = nc - 1 - i
            ax_ = up_apply(xd)
            return jnp.where(color == c,
                             z - self._invd_mul(invE, ax_), xd)

        xd = jax.lax.fori_loop(0, nc, bwd, jnp.zeros_like(r))
        return x + self.smooth_damp * xd

    def _mcgs_smooth(self, a_args, static, inv_diag, color, nc, b, x,
                     tri=None, tri_static=(None, None)):
        """Color-parallel Gauss-Seidel sweep
        (multicolor_gauss_seidel_solver.cu / fixcolor): per color
        x_c += omega * D_c^-1 (b - A x)_c with the freshest other colors.
        SYNC_COLORS = full SpMV (+halo) per color, single-chip parity;
        otherwise the color loop updates a running residual with the
        shard-local triangles (one halo exchange per sweep)."""
        omega = self.smooth_damp
        lo_offs, up_offs = tri_static

        def sweep(x, reverse):
            if tri is None:
                def body(i, xx):
                    c = (nc - 1 - i) if reverse else i
                    r = b - self._apply_mat(a_args, xx, static)
                    return jnp.where(
                        color == c,
                        xx + omega * self._invd_mul(inv_diag, r), xx)
                return jax.lax.fori_loop(0, nc, body, x)
            # local mode: r0 = b - A x once; inside the loop the masked
            # update for color c needs (b - A x_new)_c = r0_c - (T dx)_c
            # where dx (supported on already-updated colors) only reaches
            # color c through the local strict triangle T (lower for the
            # forward order, upper for the reverse)
            r0 = b - self._apply_mat(a_args, x, static)
            t, offs = (tri[1], up_offs) if reverse else (tri[0], lo_offs)

            def body(i, c_):
                xx, dx = c_
                c = (nc - 1 - i) if reverse else i
                r = r0 - self._gs_tri_apply(t, offs, dx)
                upd = omega * self._invd_mul(inv_diag, r)
                xx = jnp.where(color == c, xx + upd, xx)
                dx = jnp.where(color == c, dx + upd, dx)
                return xx, dx

            x, _ = jax.lax.fori_loop(0, nc, body,
                                     (x, jnp.zeros_like(x)))
            return x

        x = sweep(x, False)
        if getattr(self, "_mcgs_symmetric", False):
            x = sweep(x, True)
        return x

    def _milu_smooth(self, a_args, static, milu, milu_static, color, nc,
                     b, x):
        """Multicolor ILU(k) smoothing step (multicolor_ilu_solver.cu):
        x += omega * U^-1 L^-1 (b - A x) with shard-local unit-lower /
        upper factors solved as color-masked triangle applies — one halo
        exchange (the residual) per sweep."""
        Ltri, Utri, inv_ud = milu
        lo_offs, up_offs = milu_static
        r = b - self._apply_mat(a_args, x, static)

        def fwd(c, y):
            return jnp.where(color == c,
                             r - self._gs_tri_apply(Ltri, lo_offs, y), y)

        y = jax.lax.fori_loop(0, nc, fwd, jnp.zeros_like(r))

        def bwd(i, xd):
            c = nc - 1 - i
            return jnp.where(
                color == c,
                inv_ud * (y - self._gs_tri_apply(Utri, up_offs, xd)), xd)

        xd = jax.lax.fori_loop(0, nc, bwd, jnp.zeros_like(r))
        return x + self.smooth_damp * xd

    def _kacz_smooth(self, a_args, static, at_args, at_static, kacz, nc,
                     damping, b, x):
        """One Kaczmarz smoothing step (kaczmarz_solver.cu): multicolor —
        per color c, r = b - A x (halo exchange), delta = masked row
        projections r_c / ||a_c||^2, x += omega A^T delta (second halo
        exchange through the transposed operand); Cimmino (no coloring) —
        one damped simultaneous projection, exactly the single-chip
        iteration."""
        inv_rn, color = kacz
        omega = self.smooth_damp
        if color is None or nc == 0:
            r = b - self._apply_mat(a_args, x, static)
            return x + (omega * damping) * self._apply_mat(
                at_args, inv_rn * r, at_static)

        def body(c, xx):
            r = b - self._apply_mat(a_args, xx, static)
            delta = jnp.where(color == c, inv_rn * r, jnp.zeros_like(r))
            return xx + omega * self._apply_mat(at_args, delta, at_static)

        return jax.lax.fori_loop(0, nc, body, x)

    def _coarse_cg(self, a_args, static, inv_diag, b, x,
                   tol: float = 1e-10, max_iters: int = 200):
        """Jacobi-preconditioned CG to tolerance for the coarsest level when
        no replicated dense factorization exists (reference semantics:
        Cycle_Base::solveExactly always solves the coarsest exactly)."""
        ax = self.axis

        def dot(u, v):
            return jax.lax.psum(jnp.vdot(u, v), ax)

        r = b - self._apply_mat(a_args, x, static)
        z = self._invd_mul(inv_diag, r)
        p = z
        rz = dot(r, z)
        b2 = dot(b, b)
        stop = tol * tol * jnp.maximum(b2, jnp.asarray(1e-300, b2.dtype))

        def cond(st):
            _, r, _, _, it = st
            return jnp.logical_and(it < max_iters, dot(r, r).real > stop)

        def body(st):
            x, r, p, rz, it = st
            q = self._apply_mat(a_args, p, static)
            pq = dot(p, q)
            alpha = jnp.where(pq != 0, rz / jnp.where(pq == 0, 1.0, pq), 0.0)
            x = x + alpha * p
            r = r - alpha * q
            z = self._invd_mul(inv_diag, r)
            rz_new = dot(r, z)
            beta = jnp.where(rz != 0, rz_new / jnp.where(rz == 0, 1.0, rz),
                             0.0)
            return x, r, z + beta * p, rz_new, it + 1

        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
        return x

    def _mat_pytree(self, dm):
        """Operand pytree for one operator; structured (DIA + margin) form
        when the layout was detected at partition time. When neighbour
        (ppermute) exchange tables exist, "pack"/"halo" carry those and the
        static permutation rings ride in _level_static."""
        nbr = getattr(dm, "nbr_perms", None) is not None
        pack = dm.pack_nbr if nbr else dm.pack_idx
        halo = dm.halo_nbr if nbr else dm.halo_from
        if getattr(dm, "dia_bands", None) is not None and \
                dm.block_dim == (1, 1):
            mat = {"pack": pack, "halo": halo, "bands": dm.dia_bands}
            for nm in ("halo_vals_top", "halo_cols_top", "halo_vals_bot",
                       "halo_cols_bot"):
                v = getattr(dm, nm, None)
                if v is not None:
                    mat[nm] = v
            return mat
        if getattr(dm, "band_strips", None) is not None and \
                dm.block_dim == (1, 1):
            mat = {"pack": pack, "halo": halo,
                   "strips": dm.band_strips, "base": dm.band_base}
            for nm in ("halo_vals_top", "halo_cols_top", "halo_vals_bot",
                       "halo_cols_bot"):
                v = getattr(dm, nm, None)
                if v is not None:
                    mat[nm] = v
            return mat
        if getattr(dm, "halo_free", False):
            return {"cols": dm.cols, "vals": dm.vals}
        if getattr(dm, "gather_arrays", None) is not None and \
                dm.block_dim == (1, 1):
            return {"pack": pack, "halo": halo,
                    "g5": dict(dm.gather_arrays)}
        return {"cols": dm.cols, "vals": dm.vals, "pack": pack,
                "halo": halo}

    def _level_args(self):
        # static layout metadata per level (offsets/margins/band meta and
        # the ppermute rings can't live in the traced pytree)
        self._level_static = [
            (getattr(lvl.a, "dia_offsets", None),
             getattr(lvl.a, "margins", None),
             getattr(lvl.a, "band_meta", None),
             getattr(lvl.a, "nbr_perms", None),
             None if getattr(lvl.a, "gather_meta", None) is None else
             tuple(sorted(lvl.a.gather_meta.items())))
            for lvl in self.levels]
        self._pr_perms = [
            (None if lvl.p is None else getattr(lvl.p, "nbr_perms", None),
             None if lvl.r is None else getattr(lvl.r, "nbr_perms", None))
            for lvl in self.levels]
        self._gs_static = [getattr(lvl, "gs_static", (None, None))
                           for lvl in self.levels]
        self._dilu_nc = [None if getattr(lvl, "dilu_nc", None) is None
                         else int(lvl.dilu_nc) for lvl in self.levels]
        self._dilu_tri_static = [getattr(lvl, "dilu_tri_static",
                                         (None, None))
                                 for lvl in self.levels]
        self._mc_nc = [None if getattr(lvl, "mcolor_nc", None) is None
                       else int(lvl.mcolor_nc) for lvl in self.levels]
        self._mcgs_tri_static = [getattr(lvl, "mcgs_tri_static",
                                         (None, None))
                                 for lvl in self.levels]
        self._milu_nc = [None if getattr(lvl, "milu_nc", None) is None
                         else int(lvl.milu_nc) for lvl in self.levels]
        self._milu_static = [getattr(lvl, "milu_static", (None, None))
                             for lvl in self.levels]
        self._kacz_nc = [getattr(lvl, "kacz_nc", 0) for lvl in self.levels]
        self._kacz_damp = [getattr(lvl, "kacz_damp", 1.0)
                           for lvl in self.levels]
        self._kacz_static = [
            None if getattr(lvl, "kacz_at_dm", None) is None else
            (getattr(lvl.kacz_at_dm, "dia_offsets", None),
             getattr(lvl.kacz_at_dm, "margins", None),
             getattr(lvl.kacz_at_dm, "band_meta", None),
             getattr(lvl.kacz_at_dm, "nbr_perms", None),
             None if getattr(lvl.kacz_at_dm, "gather_meta", None) is None
             else tuple(sorted(lvl.kacz_at_dm.gather_meta.items())))
            for lvl in self.levels]
        out = []
        for lvl in self.levels:
            a_args = self._mat_pytree(lvl.a)
            p_args = None if lvl.p is None else self._mat_pytree(lvl.p)
            r_args = None if lvl.r is None else self._mat_pytree(lvl.r)
            gs = lvl.gs if lvl.gs is not None else ((), ())
            out.append((a_args, p_args, r_args, lvl.inv_diag,
                        lvl.coarse_dense,
                        (gs[0] or (), gs[1] or ()),
                        getattr(lvl, "dilu", None),
                        getattr(lvl, "dilu_tri", None),
                        getattr(lvl, "mcolor", None),
                        getattr(lvl, "mcgs_tri", None),
                        getattr(lvl, "milu_color", None),
                        getattr(lvl, "milu", None),
                        None if getattr(lvl, "kacz_at_dm", None) is None
                        else self._mat_pytree(lvl.kacz_at_dm),
                        getattr(lvl, "kacz", None)))
        return out

    def _build_step(self):
        """Build the jitted SPMD iteration (PCG or CG step)."""
        mesh, ax = self.mesh, self.axis
        lvl_args = self._level_args()
        n_lvls = len(lvl_args)

        split0 = getattr(self, "_split0", 0)
        bx, by = self.levels[0].a.block_dim
        bicg = self.solver_name in ("BICGSTAB", "PBICGSTAB")
        gmres = self.solver_name in ("GMRES", "FGMRES")
        amg_alone = self.solver_name == "AMG"
        pcgf = self.solver_name == "PCGF"
        cheb = self.solver_name == "CHEBYSHEV"
        idr = self.solver_name in ("IDR", "IDRMSYNC")
        s_dim = int(self.cfg.get("subspace_dim_s", self.scope))
        supported = ("PCG", "CG", "BICGSTAB", "PBICGSTAB", "GMRES",
                     "FGMRES", "AMG", "PCGF", "CHEBYSHEV", "IDR",
                     "IDRMSYNC")
        if self.solver_name not in supported:
            raise NotImplementedError(
                f"DistributedSolver does not implement "
                f"'{self.solver_name}'; supported: {supported} "
                f"(single-chip SolverFactory covers the full catalog)")
        m_rst = int(self.cfg.get("gmres_n_restart", self.scope))
        a0 = self.levels[0].a
        structured = by == 1 and (
            getattr(a0, "dia_bands", None) is not None
            or getattr(a0, "band_strips", None) is not None
            or getattr(a0, "gather_arrays", None) is not None)
        self._mat_args = self._mat_pytree(a0)
        if idr:
            # Orthonormal shadow space in the shards' row layout
            # (reference: idr_solver.cu shadow vectors). O(N/P) per
            # process: each shard's (s, Lr) block is generated from a
            # per-device seed (only addressable shards materialize),
            # orthonormalized by distributed Cholesky-QR — partial s x s
            # Grams are the only cross-process exchange.
            import jax as _jax
            import scipy.linalg as _sla
            from .multihost import allgather_host, is_multiprocess
            lv = a0.lr * bx
            my_proc = _jax.process_index()
            shadow = np.zeros((a0.n_dev, s_dim, lv), np.float64)
            gram = np.zeros((s_dim, s_dim))
            perm = getattr(a0, "row_perm", None)
            blocks = {}
            for d in range(a0.n_dev):
                if self.mesh.devices.flat[d].process_index != my_proc:
                    continue
                blk = np.random.default_rng((42, d)).standard_normal(
                    (s_dim, lv))
                if perm is not None:
                    blk[:, np.repeat(np.asarray(perm[d]) < 0, bx)] = 0.0
                else:
                    blk[:, a0.row_part.size(d) * bx:] = 0.0
                blocks[d] = blk
                gram += blk @ blk.T
            if is_multiprocess():
                gram = np.sum(allgather_host(gram.ravel()),
                              axis=0).reshape(s_dim, s_dim)
            lchol = np.linalg.cholesky(gram)
            for d, blk in blocks.items():
                shadow[d] = _sla.solve_triangular(lchol, blk, lower=True)
            self._mat_args = dict(
                self._mat_args,
                idr_P=jax.device_put(
                    shadow.astype(self._vec_dt),
                    jax.sharding.NamedSharding(mesh, P(ax))))
        static0 = (getattr(a0, "dia_offsets", None),
                   getattr(a0, "margins", None),
                   getattr(a0, "band_meta", None),
                   getattr(a0, "nbr_perms", None),
                   None if getattr(a0, "gather_meta", None) is None else
                   tuple(sorted(a0.gather_meta.items())))

        # Memoize the jitted SPMD programs on everything the closures bake
        # in statically: a values-only resetup (same partitions/sparsity/
        # solver config — the replace_coefficients time-stepping path)
        # reuses the compiled programs with fresh operand arrays instead of
        # paying a full re-trace/compile per step. Spectral bounds are part
        # of the signature, so Chebyshev-smoothed configs retrace only when
        # the bounds actually move.
        sig = (self.solver_name, self.precond_name, self.max_iters,
               self.tolerance,
               str(self.convergence), n_lvls, split0, bx, by, structured,
               s_dim, m_rst, getattr(self, "presweeps", None),
               getattr(self, "postsweeps", None),
               getattr(self, "cycle_type", None),
               getattr(self, "cheby_smoothing", None),
               getattr(self, "cheby_order", None),
               getattr(self, "smooth_damp", None),
               getattr(self, "_gs2", False),
               getattr(self, "_gs2_inner", None),
               getattr(self, "_gs2_symmetric", None),
               _freeze(self._level_static), _freeze(self._pr_perms),
               _freeze(getattr(self, "_gs_static", None)),
               _freeze(getattr(self, "_dilu_tri_static", None)),
               _freeze(getattr(self, "_mc_nc", None)),
               _freeze(getattr(self, "_mcgs_tri_static", None)),
               _freeze(getattr(self, "_milu_nc", None)),
               _freeze(getattr(self, "_milu_static", None)),
               _freeze(getattr(self, "_kacz_nc", None)),
               _freeze(getattr(self, "_kacz_damp", None)),
               _freeze(getattr(self, "_kacz_static", None)),
               _freeze(getattr(self, "_cheby_bounds", None)),
               _freeze(getattr(self, "_cheb_solver_bounds", None)),
               _freeze(getattr(self, "_cheb_precond_bounds", None)),
               getattr(self, "_cheb_precond_order", None),
               _tree_sig(self._mat_args), _tree_sig(lvl_args))
        if sig == getattr(self, "_step_sig", None) and \
                getattr(self, "_jit_solve_fused", None) is not None:
            self._flat_args = _flatten_level_args(lvl_args)
            return
        self._step_sig = sig

        def spmv0(mat, v):
            if "pack" not in mat:           # halo-free (e.g. 1 active shard)
                return jnp.sum(mat["vals"] * v[mat["cols"]], axis=1)
            if structured:
                return self._apply_mat(mat, v, static0)
            if by > 1:
                return comms.dist_spmv_block(mat["cols"], mat["vals"],
                                             mat["pack"], mat["halo"], v,
                                             by, ax, perms=static0[3])
            return comms.dist_spmv(mat["cols"], mat["vals"], mat["pack"],
                                   mat["halo"], v, ax,
                                   interior_split=split0,
                                   perms=static0[3])

        def apply_invd(invd, r):
            if bx > 1:
                rb = r.reshape(-1, bx)
                return jnp.einsum("rij,rj->ri", invd, rb).reshape(-1)
            return invd * r

        def precond(r, args):
            if self.use_amg:
                z = jnp.zeros_like(r)
                return self._vcycle(0, r, z, args)
            if self.precond_name in ("BLOCK_JACOBI", "JACOBI_L1"):
                return apply_invd(args[0][3], r)
            if self.precond_name == "CHEBYSHEV_POLY":
                # fixed-order Chebyshev polynomial in D^-1 A
                # (chebyshev_poly.cu) — SpMV + axpy only
                return self._cheby_smooth(
                    args[0][0], self._level_static[0], args[0][3],
                    self._cheb_precond_bounds, r, jnp.zeros_like(r),
                    self._cheb_precond_order)
            if self.precond_name == "MULTICOLOR_DILU":
                # DILU smoothing iterations on a zero guess, matching the
                # single-chip inner-solver semantics (the preconditioner
                # scope's max_iters applications,
                # multicolor_dilu_solver.cu)
                def one(_, xv):
                    return self._dilu_smooth(
                        args[0][0], self._level_static[0], args[0][6],
                        self._dilu_nc[0], r, xv, tri=args[0][7],
                        tri_static=self._dilu_tri_static[0])
                return jax.lax.fori_loop(0, self._dilu_pre_iters, one,
                                         jnp.zeros_like(r))
            if self.precond_name in ("MULTICOLOR_GS", "FIXCOLOR_GS"):
                def one_gs(_, xv):
                    return self._mcgs_smooth(
                        args[0][0], self._level_static[0], args[0][3],
                        args[0][8], self._mc_nc[0], r, xv,
                        tri=args[0][9],
                        tri_static=self._mcgs_tri_static[0])
                return jax.lax.fori_loop(0, self._dilu_pre_iters, one_gs,
                                         jnp.zeros_like(r))
            if self.precond_name == "MULTICOLOR_ILU":
                def one_ilu(_, xv):
                    return self._milu_smooth(
                        args[0][0], self._level_static[0], args[0][11],
                        self._milu_static[0], args[0][10],
                        self._milu_nc[0], r, xv)
                return jax.lax.fori_loop(0, self._dilu_pre_iters, one_ilu,
                                         jnp.zeros_like(r))
            if self.precond_name == "KACZMARZ":
                def one_kz(_, xv):
                    return self._kacz_smooth(
                        args[0][0], self._level_static[0], args[0][12],
                        self._kacz_static[0], args[0][13],
                        self._kacz_nc[0], self._kacz_damp[0], r, xv)
                return jax.lax.fori_loop(0, self._dilu_pre_iters, one_kz,
                                         jnp.zeros_like(r))
            return r

        def gmres_restart(mat, b, xv):
            """Fresh Krylov basis (reference: FGMRES restart,
            fgmres_solver.cu:296-605). All small dense work (R, Givens, g)
            is replicated; the basis V/Z is row-sharded."""
            r = b - spmv0(mat, xv)
            beta = comms.dist_nrm2(r, ax)
            L = r.shape[0]
            V = jnp.zeros((m_rst + 1, L), r.dtype).at[0].set(
                jnp.where(beta > 0, r / jnp.where(beta == 0, 1.0, beta), r))
            Z = jnp.zeros((m_rst, L), r.dtype)
            R = jnp.zeros((m_rst + 1, m_rst), r.dtype)
            cs = jnp.zeros((m_rst,), r.dtype)
            sn = jnp.zeros((m_rst,), r.dtype)
            g = jnp.zeros((m_rst + 1,), r.dtype).at[0].set(beta)
            return (V, Z, R, cs, sn, g, jnp.asarray(0, jnp.int32), xv), beta

        def gmres_step(mat, args, state):
            """One Arnoldi step; identical numerics to the single-chip
            _GMRESBase.solve_iteration with psum-reduced projections. The
            update always uses flexible (Z) storage — equal to right-
            preconditioned GMRES for our (linear) preconditioners."""
            x, b, V, Z, R, cs, sn, g, i, x0 = state
            vi = V[i]
            z = precond(vi, args)
            w = spmv0(mat, z)
            mask = (jnp.arange(m_rst + 1) <= i).astype(w.dtype)
            h = jax.lax.psum(jnp.conj(V) @ w, ax) * mask
            w = w - h @ V
            h2 = jax.lax.psum(jnp.conj(V) @ w, ax) * mask
            w = w - h2 @ V
            h = h + h2
            h_next = jnp.sqrt(jax.lax.psum(jnp.vdot(w, w), ax))
            V = V.at[i + 1].set(w / jnp.where(h_next == 0, 1.0, h_next))
            Z = Z.at[i].set(z)

            # unitary Givens form (identical to the single-chip _GMRESBase:
            #   x' = cs x + sn y,  y' = -conj(sn) x + conj(cs) y
            # with cs = conj(hi)/denom, sn = conj(hn)/denom) — reduces to
            # the plain real rotation for real modes, conjugates for Z/C
            def apply_rot(j, hcol):
                hj, hj1 = hcol[j], hcol[j + 1]
                c, sj = cs[j], sn[j]
                return hcol.at[j].set(c * hj + sj * hj1) \
                           .at[j + 1].set(-jnp.conj(sj) * hj +
                                          jnp.conj(c) * hj1)
            hcol = jax.lax.fori_loop(0, i, apply_rot, h)
            hcol = hcol.at[i + 1].set(h_next.astype(h.dtype))
            hi, hn = hcol[i], hcol[i + 1]
            denom = jnp.sqrt((jnp.conj(hi) * hi + jnp.conj(hn) * hn).real)
            safe = jnp.where(denom == 0, 1.0, denom).astype(h.dtype)
            c_new = jnp.where(denom == 0, 1.0 + 0.0 * hi,
                              jnp.conj(hi) / safe)
            s_new = jnp.where(denom == 0, 0.0 * hi, jnp.conj(hn) / safe)
            hcol = hcol.at[i].set(denom.astype(h.dtype)).at[i + 1].set(0.0)
            cs = cs.at[i].set(c_new)
            sn = sn.at[i].set(s_new)
            gi = g[i]
            g = g.at[i].set(c_new * gi).at[i + 1].set(-jnp.conj(s_new) * gi)
            R = R.at[:, i].set(hcol)
            nrm = jnp.abs(g[i + 1])
            k = i + 1
            y = jnp.zeros((m_rst,), x.dtype)

            def back_sub(jj, y):
                j = m_rst - 1 - jj
                rhs = g[j] - R[j] @ y
                yj = jnp.where(j < k, rhs / jnp.where(R[j, j] == 0, 1.0,
                                                      R[j, j]), 0.0)
                return y.at[j].set(yj)
            y = jax.lax.fori_loop(0, m_rst, back_sub, y)
            x_new = x0 + y @ Z

            def do_restart(_):
                st, _ = gmres_restart(mat, b, x_new)
                return st

            def keep(_):
                return (V, Z, R, cs, sn, g, i + 1, x0)
            rest = jax.lax.cond(i + 1 >= m_rst, do_restart, keep, None)
            return (x_new, b) + rest, nrm

        def step(mat, flat_args, state):
            """One Krylov iteration over the generic state pytree; returns
            (state, ||r||)."""
            args = _unflatten(flat_args)
            if gmres:
                return gmres_step(mat, args, state)
            if amg_alone:
                x, r = state
                z = precond(r, args)
                x = x + z
                r = r - spmv0(mat, z)
                return (x, r), comms.dist_nrm2(r, ax)
            if cheb:
                # mirror of the single-chip ChebyshevSolver.solve_iteration
                # (cheb_solver.cu) with the Jacobi-preconditioned operator
                x, r, p, alpha, it = state
                lam_max, lam_min = self._cheb_solver_bounds
                d_ = 0.5 * (lam_max + lam_min)
                c_ = 0.5 * (lam_max - lam_min)
                z = apply_invd(args[0][3], r)
                alpha_new = jnp.where(
                    it == 0, 1.0 / d_,
                    jnp.where(it == 1, 1.0 / (d_ - c_ * c_ / (2.0 * d_)),
                              1.0 / (d_ - alpha * c_ * c_ / 4.0)))
                beta = jnp.where(it == 0, 0.0,
                                 jnp.where(it == 1, 0.5 * (c_ / d_) ** 2,
                                           (alpha * c_ / 2.0) ** 2))
                p = z + beta * p
                x = x + alpha_new * p
                r = r - alpha_new * spmv0(mat, p)
                return (x, r, p, alpha_new, it + 1), \
                    comms.dist_nrm2(r, ax)
            if idr:
                # IDR(s) with bi-orthogonalization — mirror of the
                # single-chip IDRSolver.solve_iteration (idr_solver.cu)
                # with psum-reduced shadow projections
                import jax.scipy.linalg as jsla
                x, r, G, U, M, om = state
                Ps = mat["idr_P"]
                f = jax.lax.psum(Ps @ r, ax)
                for k in range(s_dim):
                    c_ = jsla.solve_triangular(M[k:, k:], f[k:],
                                               lower=True)
                    v = r - c_ @ G[k:]
                    v = precond(v, args)
                    u = c_ @ U[k:] + om * v
                    g = spmv0(mat, u)
                    for j in range(k):
                        al = comms.dist_dot(Ps[j], g, ax) / M[j, j]
                        g = g - al * G[j]
                        u = u - al * U[j]
                    G = G.at[k].set(g)
                    U = U.at[k].set(u)
                    M = M.at[k:, k].set(jax.lax.psum(Ps[k:] @ g, ax))
                    beta = f[k] / M[k, k]
                    r = r - beta * g
                    x = x + beta * u
                    if k + 1 < s_dim:
                        f = f.at[k + 1:].add(-beta * M[k + 1:, k])
                v = precond(r, args)
                t = spmv0(mat, v)
                om = comms.dist_dot(t, r, ax) / comms.dist_dot(t, t, ax)
                x = x + om * v
                r = r - om * t
                return (x, r, G, U, M, om), comms.dist_nrm2(r, ax)
            if pcgf:
                # flexible PCG, Polak-Ribiere correction (pcgf_solver.cu)
                x, pv, r, z, rz = state
                q = spmv0(mat, pv)
                alpha = rz / comms.dist_dot(pv, q, ax)
                x = x + alpha * pv
                r_new = r - alpha * q
                z_new = precond(r_new, args)
                beta = comms.dist_dot(z_new, r_new - r, ax) / rz
                pv = z_new + beta * pv
                return (x, pv, r_new, z_new,
                        comms.dist_dot(r_new, z_new, ax)), \
                    comms.dist_nrm2(r_new, ax)
            if bicg:
                x, r, r_star, pv, rho = state
                p_hat = precond(pv, args)
                v = spmv0(mat, p_hat)
                alpha = rho / comms.dist_dot(r_star, v, ax)
                sv = r - alpha * v
                s_hat = precond(sv, args)
                t = spmv0(mat, s_hat)
                omega = comms.dist_dot(t, sv, ax) / \
                    comms.dist_dot(t, t, ax)
                x = x + alpha * p_hat + omega * s_hat
                r_new = sv - omega * t
                rho_new = comms.dist_dot(r_star, r_new, ax)
                beta = (rho_new / rho) * (alpha / omega)
                pv = r_new + beta * (pv - omega * v)
                nrm = comms.dist_nrm2(r_new, ax)
                return (x, r_new, r_star, pv, rho_new), nrm
            x, pv, r, rho = state
            q = spmv0(mat, pv)
            alpha = rho / comms.dist_dot(pv, q, ax)
            x = x + alpha * pv
            r = r - alpha * q
            z = precond(r, args)
            rho_new = comms.dist_dot(r, z, ax)
            beta = rho_new / rho
            pv = z + beta * pv
            nrm = comms.dist_nrm2(r, ax)
            return (x, pv, r, rho_new), nrm

        def init(mat, flat_args, b, x):
            args = _unflatten(flat_args)
            if gmres:
                rest, beta = gmres_restart(mat, b, x)
                return (x, b) + rest, beta
            r = b - spmv0(mat, x)
            nrm = comms.dist_nrm2(r, ax)
            if amg_alone:
                return (x, r), nrm
            if cheb:
                return (x, r, jnp.zeros_like(r),
                        jnp.asarray(0.0, r.dtype),
                        jnp.asarray(0, jnp.int32)), nrm
            if idr:
                L = r.shape[0]
                return (x, r, jnp.zeros((s_dim, L), r.dtype),
                        jnp.zeros((s_dim, L), r.dtype),
                        jnp.eye(s_dim, dtype=r.dtype),
                        jnp.asarray(1.0, r.dtype)), nrm
            if bicg:
                return (x, r, r, r, comms.dist_dot(r, r, ax)), nrm
            z = precond(r, args)
            if pcgf:
                return (x, z, r, z, comms.dist_dot(r, z, ax)), nrm
            return (x, z, r, comms.dist_dot(r, z, ax)), nrm

        self._flat_args = _flatten_level_args(lvl_args)
        spec_rep = P()
        shard = P(ax)
        mat_specs = jax.tree.map(lambda _: shard, self._mat_args)
        # every stacked level tensor leads with the device axis (sharded);
        # the replicated coarse LU factors are the exception
        arg_specs = tuple(
            (jax.tree.map(lambda _: shard, lvl_args[i][0]),
             jax.tree.map(lambda _: shard, lvl_args[i][1] or ()) or (),
             jax.tree.map(lambda _: shard, lvl_args[i][2] or ()) or (),
             shard,
             (spec_rep, spec_rep) if lvl.coarse_dense is not None else ())
            + tuple(
                () if lvl_args[i][k] is None
                else jax.tree.map(lambda _: shard, lvl_args[i][k])
                for k in range(5, len(lvl_args[i])))
            for i, lvl in enumerate(self.levels))

        def wrap(fn, extra_in, extra_out):
            return jax.jit(jax.shard_map(
                fn, mesh=mesh,
                in_specs=(mat_specs, arg_specs) + extra_in,
                out_specs=extra_out,
                check_vma=False))

        def strip(fn):
            # shard_map passes blocks with the device axis of size 1 intact
            def unlead(v):
                return v[0] if getattr(v, "ndim", 0) >= 1 and \
                    v.shape[0] == 1 else v

            def inner(mat, flat_args, *rest):
                mat = jax.tree.map(unlead, mat)
                flat_args = jax.tree.map(unlead, flat_args)
                rest = jax.tree.map(unlead, rest)
                out = fn(mat, flat_args, *rest)
                return jax.tree.map(
                    lambda o: o[None] if getattr(o, "ndim", 0) >= 1
                    else o, out)
            return inner

        # state specs: vectors sharded on the device axis, small dense
        # work (R/cs/sn/g/i, rho) replicated
        if gmres:
            state_spec = (shard, shard, shard, shard, P(), P(), P(), P(),
                          P(), shard)
        elif amg_alone:
            state_spec = (shard, shard)
        elif cheb:
            state_spec = (shard, shard, shard, P(), P())
        elif idr:
            state_spec = (shard, shard, shard, shard, P(), P())
        elif bicg:
            state_spec = (shard, shard, shard, shard, P())
        elif pcgf:
            state_spec = (shard, shard, shard, shard, P())
        else:
            state_spec = (shard, shard, shard, P())
        self._jit_step = wrap(strip(step), (state_spec,),
                              (state_spec, P()))
        self._jit_init = wrap(strip(init), (shard, shard),
                              (state_spec, P()))

        # fused solve: the whole iterate/convergence loop as ONE SPMD
        # program (per-step host dispatch costs ~ms launch latency)
        max_iters = self.max_iters
        tol = self.tolerance
        relative = "RELATIVE" in self.convergence

        def solve_fused(mat, flat_args, b, x):
            state, nrm0 = init(mat, flat_args, b, x)
            target = tol * nrm0 if relative else tol
            hist = jnp.zeros((max_iters + 1,), nrm0.dtype).at[0].set(nrm0)

            def cond(c):
                _, it, nrm, _ = c
                return jnp.logical_and(it < max_iters, nrm > target)

            def body(c):
                st, it, _, h = c
                st, nrm = step(mat, flat_args, st)
                h = h.at[it + 1].set(nrm)
                return (st, it + 1, nrm, h)

            state, it, nrm, hist = jax.lax.while_loop(
                cond, body, (state, jnp.asarray(0, jnp.int32), nrm0, hist))
            return state[0], it, nrm, hist

        self._jit_solve_fused = wrap(strip(solve_fused), (shard, shard),
                                     (shard, P(), P(), P()))

    # -- solve ------------------------------------------------------------------

    def solve(self, b: np.ndarray, x0: Optional[np.ndarray] = None):
        t0 = time.perf_counter()
        a0 = self.levels[0].a
        scaler = getattr(self, "_scaler", None)
        if scaler is not None:
            # scale vectors live in scalar-row space (block rows expanded)
            n = a0.n_rows * a0.block_dim[0]
            b = np.asarray(b) * scaler._dl[:n]
            if x0 is not None:
                x0 = np.asarray(x0) / scaler._dr[:n]
        rr = getattr(self, "_rank_rows", None)
        bx0 = a0.block_dim[0]
        rank_local_vecs = (
            rr is not None
            and np.asarray(b).size == (rr[1] - rr[0]) * bx0)
        dsc = getattr(self, "_dist_scaler", None)
        if dsc is not None:
            s0, s1 = (rr[0], rr[1]) if rank_local_vecs \
                else (0, a0.n_rows)
            b = dsc.scale_rhs(b, s0, s1)
            if x0 is not None:
                x0 = dsc.scale_solution_in(x0, s0, s1)
        if rank_local_vecs:
            # per-rank vectors: each process passes only its owned rows
            b_d = a0.scatter_vector_local(
                np.asarray(b, self._vec_dt), rr[0], rr[1], self.mesh,
                self.axis)
            x_d = a0.scatter_vector_local(
                np.zeros_like(np.asarray(b, self._vec_dt)) if x0 is None
                else np.asarray(x0, self._vec_dt), rr[0], rr[1],
                self.mesh, self.axis)
        else:
            b_d = a0.scatter_vector(np.asarray(b, self._vec_dt), "rows",
                                    self.mesh, self.axis)
            x_d = a0.scatter_vector(
                np.zeros_like(np.asarray(b, self._vec_dt)) if x0 is None
                else np.asarray(x0, self._vec_dt), "rows", self.mesh,
                self.axis)
        if bool(self.cfg.get("fused_solve", self.scope)):
            x_out, it_d, nrm, hist = self._jit_solve_fused(
                self._mat_args, self._flat_args, b_d, x_d)
            it = int(it_d)
            # replicated outputs come back with a leading length-1 axis
            h = np.asarray(hist).reshape(-1)[:it + 1]
            self.res_history = [float(v) for v in h]
        else:
            state, nrm = self._jit_init(self._mat_args, self._flat_args,
                                        b_d, x_d)
            ini = float(nrm)
            self.res_history = [ini]
            it = 0
            target = self.tolerance * (ini if "RELATIVE" in self.convergence
                                       else 1.0)
            while it < self.max_iters:
                state, nrm = self._jit_step(self._mat_args, self._flat_args,
                                            state)
                it += 1
                val = float(nrm)
                self.res_history.append(val)
                if val <= target:
                    break
            x_out = state[0]
        self.last_iters = it
        out = a0.gather_vector_local(x_out, rr[0], rr[1]) \
            if rank_local_vecs else a0.gather_vector(x_out, "rows")
        if scaler is not None:
            out = out * scaler._dr[:a0.n_rows * a0.block_dim[0]]
        if dsc is not None:
            out = dsc.unscale_solution(
                out, *((rr[0], rr[1]) if rank_local_vecs
                       else (0, a0.n_rows)))
        self.solve_time = time.perf_counter() - t0
        ini = self.res_history[0] if self.res_history else 1.0
        target = self.tolerance * (ini if "RELATIVE" in self.convergence
                                   else 1.0)
        ok = self.res_history and self.res_history[-1] <= target
        return out, (0 if ok else 3)
