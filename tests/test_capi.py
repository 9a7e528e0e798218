"""C-API facade tests (mirrors examples/amgx_capi.c and
base/tests/capi_graceful_failure.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu import capi


def test_full_capi_flow(tmp_path, rng):
    assert capi.AMGX_initialize() == capi.RC_OK
    rc, cfg = capi.AMGX_config_create(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=200, "
        "tolerance=1e-9, convergence=RELATIVE_INI, monitor_residual=1")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    a = amgx.gallery.poisson5pt(12, 12)
    capi.AMGX_matrix_upload_all(M, a.n_rows, a.nnz, 1, 1, a.indptr,
                                a.indices, a.data)
    rc, n, bx, by = capi.AMGX_matrix_get_size(M)
    assert (n, bx, by) == (144, 1, 1)
    rc, b = capi.AMGX_vector_create(rsrc)
    rc, x = capi.AMGX_vector_create(rsrc)
    capi.AMGX_vector_upload(b, n, 1, rng.standard_normal(n))
    capi.AMGX_vector_set_zero(x, n, 1)
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    capi.AMGX_solver_solve_with_0_initial_guess(S, b, x)
    rc, status = capi.AMGX_solver_get_status(S)
    assert status == capi.SOLVE_SUCCESS
    rc, iters = capi.AMGX_solver_get_iterations_number(S)
    assert iters > 0
    rc, res = capi.AMGX_solver_get_iteration_residual(S, iters)
    assert res < 1e-7
    rc, sol = capi.AMGX_vector_download(x)
    rel = np.linalg.norm(b.data - a.to_scipy() @ sol) / \
        np.linalg.norm(b.data)
    assert rel < 1e-7
    # IO round trip
    p = str(tmp_path / "sys.mtx")
    capi.AMGX_write_system(M, b, x, p)
    rc, M2 = capi.AMGX_matrix_create(rsrc, "dDDI")
    rc, b2 = capi.AMGX_vector_create(rsrc)
    rc, x2 = capi.AMGX_vector_create(rsrc)
    capi.AMGX_read_system(M2, b2, x2, p)
    assert np.allclose(M2.csr.to_dense(), a.to_dense())
    assert np.allclose(b2.data, b.data)
    capi.AMGX_solver_destroy(S)
    capi.AMGX_matrix_destroy(M)
    capi.AMGX_finalize()


def test_capi_poisson_generator():
    rc, cfg = capi.AMGX_config_create("solver=CG, max_iters=10")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    rc, b = capi.AMGX_vector_create(rsrc)
    rc, x = capi.AMGX_vector_create(rsrc)
    capi.AMGX_generate_distributed_poisson_7pt(M, b, x, 6, 6, 6)
    assert M.csr.n_rows == 216
    assert M.csr.nnz == 216 * 7 - 2 * (36 * 3)


def test_capi_graceful_failure():
    """capi_graceful_failure.cu analog: bad inputs raise clean errors, not
    crashes."""
    with pytest.raises(amgx.AMGXConfigError):
        capi.AMGX_config_create("solver=NO_SUCH_SOLVER_XYZ, bogus=1")
    rc, cfg = capi.AMGX_config_create("solver=PCG")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    with pytest.raises(Exception):
        capi.AMGX_solver_setup(S, None)      # no matrix uploaded


def test_get_api_version():
    rc, (major, minor) = capi.AMGX_get_api_version()
    assert rc == capi.RC_OK
    assert major == 2


def test_parameters_description_dump(tmp_path):
    p = str(tmp_path / "params.json")
    capi.AMGX_write_parameters_description(p)
    import json
    d = json.loads(open(p).read())
    assert "solver" in d


def test_capi_distributed_solve_spmd():
    """AMGX_matrix_upload_distributed + solver_setup/solve runs the SPMD
    DistributedSolver over the mesh (reference: the MPI solve path), with
    resetup reusing the hierarchy."""
    import numpy as np
    import amgx_tpu as amgx
    from amgx_tpu import capi
    a = amgx.gallery.poisson7pt(10, 10, 10)
    rc, cfg = capi.AMGX_config_create(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
        "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    rc, dist = capi.AMGX_distribution_create()
    dist.set_partition_data(
        "offsets", np.linspace(0, a.n_rows, 9).astype(int))
    capi.AMGX_matrix_upload_distributed(
        M, a.n_rows, a.n_rows, a.nnz, 1, 1, a.indptr, a.indices, a.data,
        None, dist)
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    assert S.dist_solver is not None
    rc, B = capi.AMGX_vector_create(rsrc, "dDDI")
    rc, X = capi.AMGX_vector_create(rsrc, "dDDI")
    b = np.ones(a.n_rows)
    B.upload(a.n_rows, 1, b)
    X.upload(a.n_rows, 1, np.zeros(a.n_rows))
    st = capi.AMGX_solver_solve(S, B, X)
    rc, xs = capi.AMGX_vector_download(X)
    rel = np.linalg.norm(b - a.to_scipy() @ xs) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6
    M.replace_coefficients(a.data * 2.0)
    capi.AMGX_solver_resetup(S, M)
    st = capi.AMGX_solver_solve(S, B, X)
    rc, xs = capi.AMGX_vector_download(X)
    rel = np.linalg.norm(b - 2 * a.to_scipy() @ xs) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6


def test_capi_upload_consolidates_excess_partitions():
    """Fine-level consolidation: a partition vector naming more partitions
    (ranks) than the mesh has shards glues consecutive partitions onto the
    available devices (reference: matrix consolidation when ranks > GPUs,
    amgx_c.cu consolidateAndUploadAll)."""
    import numpy as np
    import jax
    import amgx_tpu as amgx
    from amgx_tpu import capi
    a = amgx.gallery.poisson5pt(24, 24)
    n_parts = 3 * len(jax.devices())           # 3 ranks per shard
    pv = (np.arange(a.n_rows) * n_parts // a.n_rows).astype(np.int64)
    rc, cfg = capi.AMGX_config_create(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
        "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    rc, dist = capi.AMGX_distribution_create()
    dist.set_partition_data("vector", pv)
    capi.AMGX_matrix_upload_distributed(
        M, a.n_rows, a.n_rows, a.nnz, 1, 1, a.indptr, a.indices, a.data,
        None, dist)
    assert M.manager.row_part.n_dev <= len(jax.devices())
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    assert S.dist_solver is not None
    rc, B = capi.AMGX_vector_create(rsrc, "dDDI")
    rc, X = capi.AMGX_vector_create(rsrc, "dDDI")
    b = np.ones(a.n_rows)
    B.upload(a.n_rows, 1, b)
    X.upload(a.n_rows, 1, np.zeros(a.n_rows))
    st = capi.AMGX_solver_solve(S, B, X)
    rc, xs = capi.AMGX_vector_download(X)
    rel = np.linalg.norm(b - a.to_scipy() @ xs) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6


def test_capi_scattered_partition_vector_maps_vectors():
    """A non-contiguous partition vector renumbers the matrix internally;
    rhs/solution stay in USER row order at the API boundary (reference:
    DistributedManager renumbering + inverse_renumbering,
    distributed_manager.cu)."""
    import numpy as np
    import jax
    import amgx_tpu as amgx
    from amgx_tpu import capi
    a = amgx.gallery.poisson5pt(20, 20)
    n_dev = len(jax.devices())
    pv = np.arange(a.n_rows) % n_dev            # round-robin: scattered
    rc, cfg = capi.AMGX_config_create(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=400, "
        "tolerance=1e-9, convergence=RELATIVE_INI, monitor_residual=1")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    rc, dist = capi.AMGX_distribution_create()
    dist.set_partition_data("vector", pv)
    capi.AMGX_matrix_upload_distributed(
        M, a.n_rows, a.n_rows, a.nnz, 1, 1, a.indptr, a.indices, a.data,
        None, dist)
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    rc, B = capi.AMGX_vector_create(rsrc, "dDDI")
    rc, X = capi.AMGX_vector_create(rsrc, "dDDI")
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.n_rows)           # non-symmetric rhs so a
    B.upload(a.n_rows, 1, b)                    # permutation mismatch shows
    X.upload(a.n_rows, 1, np.zeros(a.n_rows))
    st = capi.AMGX_solver_solve(S, B, X)
    rc, xs = capi.AMGX_vector_download(X)
    rel = np.linalg.norm(b - a.to_scipy() @ xs) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6


def test_capi_surface_complete():
    """Every function entry point in the reference amgx_c.h exists in
    capi (handles/typedefs/callback types excluded — Python objects
    replace them)."""
    import re
    import amgx_tpu.capi as capi
    ref = open("/root/reference/base/include/amgx_c.h").read()
    declared = set(re.findall(r"AMGX_RC\s+AMGX_API\s+(AMGX_\w+)", ref))
    ours = {n for n in dir(capi) if n.startswith("AMGX_")}
    missing = sorted(declared - ours)
    assert not missing, f"missing C-API entry points: {missing}"


def test_capi_matrix_vector_multiply_and_residual():
    import numpy as np
    import amgx_tpu as amgx
    from amgx_tpu import capi
    a = amgx.gallery.poisson5pt(12, 12)
    rc, cfg = capi.AMGX_config_create(
        "solver=CG, max_iters=200, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1")
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    capi.AMGX_matrix_upload_all(M, a.n_rows, a.nnz, 1, 1, a.indptr,
                                a.indices, a.data)
    rc, X = capi.AMGX_vector_create(rsrc)
    rc, Y = capi.AMGX_vector_create(rsrc)
    x = np.arange(a.n_rows, dtype=float)
    X.upload(a.n_rows, 1, x)
    capi.AMGX_matrix_vector_multiply(M, X, Y)
    assert np.allclose(Y.data, a.to_scipy() @ x)
    rc, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    rc, B = capi.AMGX_vector_create(rsrc)
    B.upload(a.n_rows, 1, np.ones(a.n_rows))
    capi.AMGX_vector_set_zero(X, a.n_rows, 1)
    capi.AMGX_solver_solve(S, B, X)
    rc, nrm = capi.AMGX_solver_calculate_residual_norm(S, M, B, X)
    assert rc == capi.RC_OK and nrm < 1e-6
