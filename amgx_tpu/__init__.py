"""amgx_tpu — a TPU-native algebraic-multigrid solver framework.

Built from scratch in JAX/Pallas with the capability surface of NVIDIA AMGX
(reference layout mapped in SURVEY.md): Krylov solvers, classical and
aggregation AMG, smoother catalog, eigensolvers, scoped JSON configuration,
and row-partitioned multi-chip distribution over jax.sharding meshes.

Quick start::

    import amgx_tpu as amgx
    amgx.initialize()
    cfg = amgx.AMGConfig(open("PCG_CLASSICAL_V_JACOBI.json").read())
    A = amgx.gallery.poisson7pt(32, 32, 32)
    solver = amgx.SolverFactory.allocate(cfg)
    solver.setup(amgx.Matrix(A))
    x, status = solver.solve(b)
"""

from __future__ import annotations

__version__ = "0.1.0"
# AMGX API compatibility version (reference: ReleaseVersion.txt v2.1.x)
__amgx_api_version__ = (2, 1)

import os as _os

import jax as _jax


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default (reference analog:
    AMGX's ~1 ms setup — README.md:109-112 — vs minutes of XLA compile per
    process without a cache; a time-stepping user restarts processes).
    Executables are keyed by HLO hash, so every (level-shape signature,
    config) pair caches independently and automatically. Opt out with
    AMGX_TPU_COMPILE_CACHE=0; point elsewhere with AMGX_TPU_CACHE_DIR."""
    flag = _os.environ.get("AMGX_TPU_COMPILE_CACHE", "1").lower()
    if flag in ("0", "off", "false"):
        return
    # CPU-backend processes (tests, driver dryruns) skip the persistent
    # cache: XLA:CPU AOT artifacts embed compile-machine feature lists
    # that the loader flags as SIGILL risks on feature mismatch, and CPU
    # compiles are cheap anyway
    if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        return
    cache_dir = _os.environ.get(
        "AMGX_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "amgx_tpu",
                      "xla"))
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:                     # noqa: BLE001 — cache is advisory
        pass


_enable_persistent_compile_cache()

from . import params as _params          # registers the parameter catalog
from .config import (AMGConfig, AMGXConfigError, register_parameter,
                     parameter_registry, write_parameters_description)
from .matrix import Matrix, CSRMatrix, EllMatrix, DenseOperator, \
    csr_to_ell, csr_to_dense_op, mode_dtypes
from .ops.spmv import DiaMatrix, csr_to_dia, multiply, residual
from .resources import Resources
from . import gallery, io, operators, convergence, scalers, coloring
from .solvers import Solver, SolverFactory, SolveStatus
from .amg import AMG, AMGLevel
from . import eigensolvers
from .eigensolvers import EigenSolverFactory, AMGEigenSolver

_initialized = False


def initialize(enable_x64: bool = True) -> None:
    """Library init (reference: AMGX_initialize, amgx_c.cu:2318).

    Factories self-register at import; this enables f64 for the dDDI-style
    modes and is idempotent.
    """
    global _initialized
    if enable_x64:
        _jax.config.update("jax_enable_x64", True)
    _initialized = True


def finalize() -> None:
    """Reference: AMGX_finalize. Nothing to tear down — kept for API
    parity."""
    global _initialized
    _initialized = False


def get_api_version():
    return __amgx_api_version__


# C-API compatible facade (AMGX_* entry points)
from . import capi  # noqa: E402,F401
