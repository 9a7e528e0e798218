"""AMG hierarchy: level construction and the setup loop.

References: base/src/amg.cu:177-450 (AMG_Setup loop), base/include/amg_level.h
(AMG_Level), core/src/classical/classical_amg_level.cu and
core/src/aggregation/aggregation_amg_level.cu (level types).

TPU re-design: the setup loop is host-orchestrated (like the reference's CPU
driver loop) and produces a *static pytree of per-level device operators*;
the whole solve-phase cycle then traces into one XLA program. Coarse levels
below ``dense_threshold_rows`` store dense operators so their SpMVs run on
the MXU.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import AMGConfig
from ..matrix import CSRMatrix, Matrix, csr_to_ell, mode_dtypes
from ..ops.spgemm import galerkin_product, aggregation_galerkin
from . import aggregation as agg_mod
from . import classical as cls_mod


class AMGLevel:
    """One level: fine matrix handle, smoother, transfer operators, and the
    link to the next-coarser level (reference: AMG_Level, amg_level.h:73)."""

    def __init__(self, m: Matrix, index: int):
        self.m = m
        self.index = index
        self.smoother = None
        self.P = None            # device op (n_fine x n_coarse)
        self.R = None            # device op (n_coarse x n_fine)
        self.p_csr: Optional[CSRMatrix] = None
        self.r_csr: Optional[CSRMatrix] = None
        self.agg_map = None      # aggregation: fine->aggregate
        self.cf_map = None       # classical: C/F split
        self.strong = None

    @property
    def n_rows(self):
        return self.m.csr.n_rows

    @property
    def nnz(self):
        return self.m.csr.nnz


@jax.tree_util.register_pytree_node_class
class PaddedTransfer:
    """P/R transfer riding a fast rectangular device op (G5 gather), with
    the cycle's padding contract: apply() returns exactly ``out_len``
    entries regardless of the inner op's own padding."""

    def __init__(self, inner, out_len: int):
        self.inner = inner
        self.out_len = int(out_len)

    def tree_flatten(self):
        return ((self.inner,), (self.out_len,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def shape(self):
        return self.inner.shape

    def apply(self, x):
        y = self.inner.apply_rect(x)
        if y.shape[0] < self.out_len:
            y = jnp.pad(y, (0, self.out_len - y.shape[0]))
        return y[:self.out_len]

    def __repr__(self):
        return f"PaddedTransfer({self.inner!r}, out_len={self.out_len})"


def _transfer_to_device(csr: CSRMatrix, block_dim, dtype, row_pad: int = 8):
    """Build the device op for P/R; for block systems the scalar transfer
    entries become identity-scaled blocks so block vectors move per
    component. ``row_pad`` makes the output padding match the destination
    level's operator padding so cycle vectors keep one consistent length.

    On TPU, large scalar transfers ride the lane-binned gather kernel
    (G5): a padded-ELL apply is an XLA gather that scalarizes (~7 ns/nnz)
    and dominated the V-cycle (chip breakdown, BENCH_NOTES round 5 —
    L0 R.apply alone was 2.7 ms of a 4.5 ms cycle; G5 runs it in tens
    of us). Reference analog: cuSPARSE-backed transfer products,
    aggregation_amg_level.cu:282."""
    bx = block_dim[0]
    if bx == 1:
        if (jax.default_backend() == "tpu" and csr.nnz >= 8192
                and np.dtype(dtype).itemsize <= 4
                and not np.iscomplexobj(csr.data)):
            from ..ops.gather_spmv import csr_to_gather
            gm = csr_to_gather(csr, dtype=dtype)
            if gm is not None:
                n_pad = max(row_pad, -(-csr.n_rows // row_pad) * row_pad)
                return PaddedTransfer(gm, n_pad)
        return csr_to_ell(csr, dtype=dtype, row_pad=row_pad)
    vals = np.einsum("k,ij->kij", csr.data.astype(np.float64), np.eye(bx))
    bcsr = CSRMatrix(csr.n_rows, csr.n_cols, csr.indptr, csr.indices, vals,
                     block_dim=(bx, bx))
    return csr_to_ell(bcsr, dtype=dtype, row_pad=row_pad)


class AMG:
    """The hierarchy owner/driver (reference: AMG class, base/include/amg.h:
    70-200)."""

    def __init__(self, cfg: AMGConfig, scope: str = "default"):
        self.cfg = cfg
        self.scope = scope
        g = lambda k: cfg.get(k, scope)
        self.algorithm = g("algorithm")
        self.max_levels = g("max_levels")
        self.min_coarse_rows = g("min_coarse_rows")
        self.coarsen_threshold = g("coarsen_threshold")
        self.presweeps = g("presweeps")
        self.postsweeps = g("postsweeps")
        self.coarsest_sweeps = g("coarsest_sweeps")
        self.finest_sweeps = g("finest_sweeps")
        self.error_scaling = g("error_scaling")
        self.intensive_smoothing = bool(g("intensive_smoothing"))
        self.cycle_type = g("cycle")
        self.cycle_iters = g("cycle_iters")
        self.dense_lu_num_rows = g("dense_lu_num_rows")
        self.structure_reuse_levels = g("structure_reuse_levels")
        self.interp_trunc_factor = g("interp_truncation_factor")
        self.interp_max_elements = g("interp_max_elements")
        self.aggressive_levels = g("aggressive_levels")
        self.print_grid_stats = bool(g("print_grid_stats"))
        self.levels: List[AMGLevel] = []
        self.coarse_solver = None
        self.setup_time = 0.0

    # -- setup loop (reference: AMG_Setup::setup, amg.cu:182) -----------------

    def setup(self, m: Matrix) -> None:
        t0 = time.perf_counter()
        from ..solvers.base import SolverFactory
        self.levels = []
        level = AMGLevel(m, 0)
        self.levels.append(level)
        while True:
            n = level.n_rows
            if len(self.levels) >= self.max_levels:
                break
            if n <= max(self.min_coarse_rows, 2):
                break
            if self.dense_lu_num_rows and n <= self.dense_lu_num_rows \
                    and len(self.levels) > 1:
                # reference: switch to the dense-LU coarse solve once a
                # level is small enough (amg.cu dense_lu_num_rows gate)
                break
            created = self._create_coarse_level(level)
            if created is None:
                break
            coarse = created
            nc = coarse.n_rows
            if nc >= n or nc == 0:
                # no coarsening progress
                self.levels[-1].P = self.levels[-1].R = None
                break
            if n / max(nc, 1) < self.coarsen_threshold:
                break
            self.levels.append(coarse)
            level = coarse
        # smoothers for all but the coarsest; coarse solver for the last
        for lvl in self.levels[:-1]:
            lvl.smoother = SolverFactory.allocate(self.cfg, self.scope,
                                                  "smoother")
            lvl.smoother.setup(lvl.m)
        coarsest = self.levels[-1]
        name, _ = self.cfg.get_pair("coarse_solver", self.scope)
        if name != "NOSOLVER":
            self.coarse_solver = SolverFactory.allocate(
                self.cfg, self.scope, "coarse_solver")
            self.coarse_solver.setup(coarsest.m)
        else:
            coarsest.smoother = SolverFactory.allocate(self.cfg, self.scope,
                                                       "smoother")
            coarsest.smoother.setup(coarsest.m)
        self.setup_time = time.perf_counter() - t0
        if self.print_grid_stats:
            from ..logging_util import amgx_output
            amgx_output(self.grid_stats_string() + "\n")

    def resetup(self, m: Matrix) -> None:
        """Structure reuse (reference: amg.cu:260-290 structure_reuse_levels;
        AMGX_solver_resetup): keep P/R (and maps) of the first k levels and
        only recompute Galerkin values."""
        k = self.structure_reuse_levels
        if k == 0 or not self.levels:
            return self.setup(m)
        if k < 0:
            k = len(self.levels)
        from ..solvers.base import SolverFactory
        self.levels[0].m = m
        reuse = min(k, len(self.levels) - 1)
        for i in range(reuse):
            lvl = self.levels[i]
            coarse = self.levels[i + 1]
            if lvl.agg_map is not None:
                ac = aggregation_galerkin(lvl.m.csr, lvl.agg_map,
                                          coarse.n_rows)
            else:
                ac = galerkin_product(lvl.r_csr, lvl.m.csr, lvl.p_csr)
            cm = Matrix(ac, mode=m.mode)
            cm.csr.aux["fine_reordered"] = True
            if lvl.cf_map is not None:
                cm.csr.aux["cf_map"] = lvl.cf_map
            # materialize the device op with the hierarchy's own threshold
            # (as _create_coarse_level does) BEFORE any smoother/coarse
            # solver builds it with a different scope's threshold — the
            # reused P/R pads must keep matching the level op's padding.
            # The old level op donates its layout: a values-only resetup
            # becomes a small upload + device scatter (ops/value_update)
            old_op = getattr(self.levels[i + 1].m, "_device_op", None)
            cm.device_op(dense_threshold=max(
                self.cfg.get("dense_threshold_rows", self.scope), 0),
                donor=old_op)
            self.levels[i + 1].m = cm
        # rebuild everything below the reused prefix and splice it in (the
        # sub-hierarchy may coarsen the new values differently)
        if reuse + 1 < len(self.levels):
            sub = AMG(self.cfg, self.scope)
            sub.setup(self.levels[reuse].m)
            self.levels = self.levels[:reuse] + sub.levels
            self.coarse_solver = sub.coarse_solver
            refresh = self.levels[:reuse]
        else:
            refresh = self.levels[:-1]
            if self.coarse_solver is not None:
                self.coarse_solver.setup(self.levels[-1].m)
        for lvl in refresh:
            lvl.smoother = SolverFactory.allocate(self.cfg, self.scope,
                                                  "smoother")
            lvl.smoother.setup(lvl.m)

    # -- coarse level creation ------------------------------------------------

    def _create_coarse_level(self, level: AMGLevel) -> Optional[AMGLevel]:
        cfg, scope = self.cfg, self.scope
        csr = level.m.csr
        mode = level.m.mode
        _, mat_dt = mode_dtypes(mode)
        if self.algorithm == "AGGREGATION":
            selector = cfg.get("selector", scope)
            agg, nc = agg_mod.select_aggregates(csr, selector, cfg, scope)
            if nc == 0 or nc >= csr.n_rows:
                return None
            level.agg_map = agg
            p_csr, r_csr = agg_mod.build_p_r(agg, nc)
            ac = aggregation_galerkin(csr, agg, nc)
        elif self.algorithm in ("CLASSICAL", "ENERGYMIN"):
            aggressive = level.index < self.aggressive_levels
            theta = cfg.get("strength_threshold", scope)
            strength = cfg.get("strength", scope)
            strong = cls_mod.strong_connections(
                csr, strength, theta,
                max_row_sum=cfg.get("max_row_sum", scope),
                affinity_iters=cfg.get("affinity_iterations", scope),
                affinity_vectors=cfg.get("affinity_vectors", scope))
            selector = cfg.get("selector", scope)
            if aggressive:
                asel = cfg.get("aggressive_selector", scope)
                if asel != "DEFAULT":
                    selector = asel
                elif not selector.startswith("AGGRESSIVE"):
                    selector = "AGGRESSIVE_" + selector
            if self.algorithm == "ENERGYMIN":
                selector = "CR"
            cf_map = cls_mod.select_cf(csr, strong, selector, cfg, scope)
            if self.algorithm == "ENERGYMIN":
                # CR can strand F nodes with no nearby C: promote them so
                # every F row gets an interpolatory set (constants preserved)
                from .energymin import ensure_coverage
                cf_map = ensure_coverage(csr, strong, cf_map)
            nc = int(cf_map.max()) + 1 if (cf_map >= 0).any() else 0
            if nc == 0 or nc >= csr.n_rows:
                return None
            interp = cfg.get("interpolator", scope)
            if aggressive:
                interp = cfg.get("aggressive_interpolator", scope)
            if interp == "D1":
                p_csr = cls_mod.direct_interpolation(csr, strong, cf_map)
            elif interp == "D2":
                p_csr = cls_mod.distance2_interpolation(csr, strong, cf_map)
            elif interp in ("MULTIPASS",):
                p_csr = cls_mod.multipass_interpolation(csr, strong, cf_map)
            elif interp == "EM":
                from .energymin import em_interpolation
                p_csr = em_interpolation(csr, strong, cf_map)
            else:
                raise ValueError(f"Unknown interpolator '{interp}'")
            p_csr = cls_mod.truncate_interpolation(
                p_csr, self.interp_trunc_factor, self.interp_max_elements)
            r_csr = p_csr.transpose()
            ac = galerkin_product(r_csr, csr, p_csr)
            level.cf_map = cf_map
            level.strong = strong
        else:
            raise ValueError(f"Unknown AMG algorithm '{self.algorithm}'")

        # RCM-permute non-stencil coarse operators so the MXU band format
        # applies (TPU gathers scalarize; bandedness is restored by
        # reordering — the data is restructured, not the kernel). Aggregate
        # numbering already inherits fine-grid locality, so this only fires
        # when the natural coarse ordering isn't band-friendly either.
        from ..ops.spmv import csr_to_dia
        from ..ops import band as band_mod
        if (csr_to_dia(ac) is None and ac.n_rows > 256
                and band_mod.csr_to_band(ac) is None):
            perm = band_mod.rcm_permutation(ac)
            rank = np.empty_like(perm)
            rank[perm] = np.arange(len(perm))
            ac = band_mod.permute_square(ac, perm)
            p_csr = band_mod.permute_cols(p_csr, perm)
            r_csr = band_mod.permute_rows(r_csr, perm)
            if level.agg_map is not None:
                keep = level.agg_map >= 0
                level.agg_map = np.where(keep, rank[np.where(
                    keep, level.agg_map, 0)], -1)
            if level.cf_map is not None:
                keep = level.cf_map >= 0
                level.cf_map = np.where(keep, rank[np.where(
                    keep, level.cf_map, 0)], cls_mod.FINE)

        level.p_csr, level.r_csr = p_csr, r_csr
        cm = Matrix(ac, mode=mode)
        # hierarchy-internal matrix: its index space is fixed by P/R — the
        # attached smoother/coarse solver must never re-permute it
        cm.csr.aux["fine_reordered"] = True
        if level.cf_map is not None:
            cm.csr.aux["cf_map"] = level.cf_map
        coarse = AMGLevel(cm, level.index + 1)
        # coarse operators small enough for the MXU go dense; build first so
        # the transfer operators can match both levels' row paddings
        dense_thr = max(self.cfg.get("dense_threshold_rows", scope), 0)
        coarse_op = cm.device_op(dense_threshold=dense_thr)
        fine_pad = level.m.device_op(dense_threshold=dense_thr).n_pad
        level.P = _transfer_to_device(p_csr, csr.block_dim, mat_dt,
                                      row_pad=fine_pad)
        level.R = _transfer_to_device(r_csr, csr.block_dim, mat_dt,
                                      row_pad=coarse_op.n_pad)
        return coarse

    # -- stats (reference: amg.cu getGridStatisticsString) ----------------------

    def grid_stats_string(self) -> str:
        lines = ["AMG Grid:", f"         Number of Levels: "
                 f"{len(self.levels)}",
                 f"{'LVL':>12s} {'ROWS':>12s} {'NNZ':>14s} {'SPRSTY':>10s}"]
        lines.append("         " + "-" * 50)
        total_rows = total_nnz = 0
        for lvl in self.levels:
            n, nnz = lvl.n_rows, lvl.nnz
            total_rows += n
            total_nnz += nnz
            sp = nnz / max(1, n * n)
            lines.append(f"{lvl.index:>12d} {n:>12d} {nnz:>14d} {sp:>10.3g}")
        fine = self.levels[0]
        lines.append("         " + "-" * 50)
        lines.append(f"     Grid Complexity: "
                     f"{total_rows / max(1, fine.n_rows):.5g}")
        lines.append(f" Operator Complexity: "
                     f"{total_nnz / max(1, fine.nnz):.5g}")
        return "\n".join(lines)
