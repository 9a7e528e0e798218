"""Benchmark driver — prints ONE JSON line with the headline metric.

Run on real TPU hardware by the round driver. Phases run in isolated
subprocesses with hard deadlines (remote-TPU compiles can wedge), so the
JSON line is always emitted.

Measures:
  * SpMV throughput: the Pallas 2-D tiled DIA kernel (stencil path, near
    speed-of-light) and the general ELL gather path, timed inside one jitted
    fori_loop so the tunneled runtime's ~300us per-op launch floor amortizes
    against real HBM traffic.
  * AMG-preconditioned PCG setup + solve wall time (one fused lax.while_loop
    program).
Headline: SpMV effective bandwidth; vs_baseline = fraction of the chip's HBM
speed-of-light (the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_HBM_GBPS = {
    "TPU v2": 700.0, "TPU v3": 900.0, "TPU v4": 1228.0,
    "TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v5p": 2765.0,
    "TPU v5": 2765.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0,
}


def _hbm_gbps(kind: str) -> float:
    best = None
    for k, v in _HBM_GBPS.items():
        if kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else 819.0


# ---------------------------------------------------------------------------
# phases (each runs in its own subprocess)
# ---------------------------------------------------------------------------

def _slope_time(g, inner: int, reps: int) -> float:
    """Seconds per iteration of a chained device computation.

    ``g(k)`` must return a device SCALAR that depends on k chained
    iterations. Through the remote-TPU tunnel ``block_until_ready`` is a
    NO-OP (measured: returns in ~80us while the compute takes seconds), so
    the only reliable sync is fetching a result; a scalar fetch costs one
    ~28 ms round trip. Timing k and 3k and taking the slope cancels both
    the round trip and the dispatch floor."""
    import numpy as _np
    for k in (inner, 3 * inner):
        float(g(k))                          # compile + warm both programs
    slopes = []
    for _ in range(max(3, reps)):
        t0 = time.perf_counter()
        float(g(inner))
        t1 = time.perf_counter()
        float(g(3 * inner))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * inner))
    # median, not min: one jittered tunnel round trip can make a single
    # slope collapse to ~0 (BENCH_r04 draft showed a bf16 phase at 9.5
    # TB/s — 12x over HBM speed of light — from exactly this)
    est = float(_np.median(slopes))
    return max(est, 1e-12)


def phase_device():
    import jax
    d = jax.devices()[0]
    print(json.dumps({"kind": getattr(d, "device_kind", str(d)),
                      "platform": d.platform}))


def phase_spmv_dia(n_side: int, inner: int, reps: int):
    import jax
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.ops.spmv import csr_to_dia, dia_spmv_pallas2d, dia_spmv
    dtype = np.float32
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    dia = csr_to_dia(a, dtype=dtype)
    on_tpu = jax.devices()[0].platform == "tpu"
    scale = np.asarray(0.12, dtype)

    # the operator rides as a jit OPERAND (DiaMatrix is a pytree node):
    # closure capture would bake multi-MB constants into the HLO, which
    # the remote-compile tunnel chokes on at large grids
    # chunk 512 measured fastest on v5e (sweep at 128^3: 128 -> 217 GB/s,
    # 256 -> 525, 512 -> 608, 1024 -> 594; >=2048 exceeds VMEM)
    f_op = (lambda op, v: dia_spmv_pallas2d(op, v, chunk_rows=512)) \
        if on_tpu else (lambda op, v: dia_spmv(op, v))

    def many(op, v, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, u: f_op(op, u) * scale, v))
    g = jax.jit(many, static_argnums=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        dia.n_pad).astype(dtype))
    best = _slope_time(lambda k: g(dia, x, k), inner, reps)
    nbytes = (len(dia.offsets) + 2) * dia.n_pad * 4
    out = {"n": a.n_rows, "nnz": a.nnz, "time_s": best,
           "gbps": nbytes / best / 1e9,
           "gnnz_per_s": a.nnz / best / 1e9}

    # bf16 matrix values (dBFI-family modes): half the operator traffic
    dia_h = csr_to_dia(a, dtype=jnp.bfloat16)
    gh = jax.jit(lambda op, v, k: jnp.sum(jax.lax.fori_loop(
        0, k, lambda i, u: (f_op(op, u) * scale).astype(v.dtype), v)),
        static_argnums=2)
    best_h = _slope_time(lambda k: gh(dia_h, x, k), inner, reps)
    nbytes_h = len(dia_h.offsets) * dia_h.n_pad * 2 + 2 * dia_h.n_pad * 4
    out["bf16"] = {"time_s": best_h, "gbps": nbytes_h / best_h / 1e9,
                   "gnnz_per_s": a.nnz / best_h / 1e9}
    print(json.dumps(out))


def phase_spmv_ell(n_side: int, inner: int, reps: int):
    import jax
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.matrix import csr_to_ell
    dtype = np.float32
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    op = csr_to_ell(a, dtype=dtype)
    scale = np.asarray(0.12, dtype)

    def many(opnd, v, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, u: opnd.apply(u) * scale, v))

    g = jax.jit(many, static_argnums=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        op.n_pad).astype(dtype))
    best = _slope_time(lambda k: g(op, x, k), inner, reps)
    nbytes = op.vals.size * 4 + op.cols.size * 4 + 2 * op.n_pad * 4
    print(json.dumps({"n": a.n_rows, "nnz": a.nnz, "time_s": best,
                      "gbps": nbytes / best / 1e9,
                      "gnnz_per_s": a.nnz / best / 1e9}))


def phase_spmv_gather(n_side: int, inner: int, reps: int):
    """General-sparsity path: randomly permuted 3-D Poisson (layout ladder
    cannot reorder it back — this is the pure lane-binned gather kernel).
    Effective GB/s accounts CSR-equivalent traffic (8 B/nnz + vectors)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    import amgx_tpu as amgx
    from amgx_tpu.matrix import CSRMatrix
    from amgx_tpu.ops.gather_spmv import csr_to_gather
    dtype = np.float32
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    rng = np.random.default_rng(0)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    csr = CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices,
                    s.data.astype(dtype))
    t0 = time.perf_counter()
    gm = csr_to_gather(csr, dtype=dtype)
    setup_t = time.perf_counter() - t0
    scale = np.asarray(0.12, dtype)

    def many(opnd, v, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, u: opnd.apply(u) * scale, v))

    g = jax.jit(many, static_argnums=2)
    x = jnp.asarray(rng.standard_normal(csr.n_rows).astype(dtype))
    best = _slope_time(lambda k: g(gm, x, k), inner, reps)
    nbytes = csr.nnz * 8 + 2 * csr.n_rows * 4      # CSR-equivalent traffic
    # rev-3 per-slot traffic: vals 4 + hl 2 + src 1 + EN Qc bytes, plus
    # one x-group read per (panel, group) run and the vectors
    raw_bytes = (gm.slots * (7 + gm.Qc) +
                 gm.n_panels * min(csr.n_cols, gm.wpg * gm.W * 128) * 4 +
                 2 * csr.n_rows * 4)
    out = {"n": csr.n_rows, "nnz": csr.nnz, "time_s": best,
           "gbps": nbytes / best / 1e9,
           "raw_gbps": raw_bytes / best / 1e9,
           "gnnz_per_s": csr.nnz / best / 1e9,
           "slots_per_nnz": gm.slots / csr.nnz,
           "setup_s": setup_t}

    # BSR sub-phase: 4x4 coupled blocks on a permuted 2-D mesh — the G5
    # pack covers blocks via scalar expansion (multiply.cu:1056-1262)
    side2 = max(16, n_side * 2)
    base = amgx.gallery.poisson5pt(side2, side2, dtype=dtype)
    perm2 = rng.permutation(base.n_rows)
    sb = base.to_scipy().tocsr()[perm2][:, perm2].tocsr()
    coup = (rng.standard_normal((4, 4)) * 0.2 + np.eye(4)).astype(dtype)
    data4 = np.einsum("k,ij->kij", sb.data.astype(dtype), coup)
    a4 = CSRMatrix(base.n_rows, base.n_cols, sb.indptr, sb.indices, data4,
                   block_dim=(4, 4))
    gm4 = csr_to_gather(a4, dtype=dtype)
    if gm4 is not None:
        x4 = jnp.asarray(rng.standard_normal(
            gm4.n_pad * gm4.block_dim[0]).astype(dtype))
        b4 = _slope_time(lambda k: g(gm4, x4, k), inner, reps)
        nnz4 = a4.nnz * 16
        out["bsr"] = {"n": a4.n_rows, "block": 4, "nnz_scalar": nnz4,
                      "time_s": b4,
                      "gbps": (nnz4 * 8 + 2 * a4.n_rows * 4 * 4) / b4 / 1e9,
                      "gnnz_per_s": nnz4 / b4 / 1e9,
                      "slots_per_nnz": gm4.slots / nnz4}
    print(json.dumps(out))


def phase_amg(n_side: int):
    import amgx_tpu as amgx
    dtype = np.float32
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": "dFFI", "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "dense_threshold_rows": 4096,
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_8",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7,
                           "structure_reuse_levels": -1,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 64, "max_levels": 12,
                           "cycle": "V"}}})
    import jax.numpy as jnp
    jnp.zeros(8).block_until_ready()      # backend/tunnel init off the clock
    s = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s.setup(amgx.Matrix(a, mode="dFFI"))
    setup_t = time.perf_counter() - t0
    # steady-state setup (time-stepping / resetup-representative): numpy
    # pipelines warm, no backend-init or first-transfer overheads
    s2 = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s2.setup(amgx.Matrix(a, mode="dFFI"))
    setup_warm_t = time.perf_counter() - t0
    del s2
    b = np.ones(a.n_rows, dtype)
    x, status = s.solve(b)           # compile + solve
    t0 = time.perf_counter()
    x, status = s.solve(b)           # steady state
    solve_t = time.perf_counter() - t0
    # time-stepping: replace_coefficients + structure-reuse resetup +
    # solve, with the round-5 device value-update path (small upload +
    # device scatter instead of full repack); report the steady step
    step_t = None
    try:
        m_user = s._m_user or s.m
        a0 = np.array(m_user.csr.data)
        for it in range(3):
            m_user.replace_coefficients(a0 * (1.0 + 0.01 * (it + 1)))
            t0 = time.perf_counter()
            s.resetup()
            s.solve(b)
            step_t = time.perf_counter() - t0
    except Exception:                              # noqa: BLE001
        pass
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    print(json.dumps({
        "n": a.n_rows, "nnz": a.nnz, "setup_s": setup_t,
        "setup_warm_s": setup_warm_t,
        "solve_s": solve_t, "iters": s.last_iters, "status": status,
        "timestep_s": step_t,
        "rel_resid": (h[-1] / h[0]) if h and h[0] else None,
        "levels": len(s.preconditioner.amg.levels)
        if getattr(s, "preconditioner", None) is not None else 0}))


def _classical_cfg(mode, fused, max_iters, tol):
    return {"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": max_iters, "tolerance": tol,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1 if fused else 0, "mode": mode, "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        # the reference's own classical flagship truncates interpolation
        # (AMG_CLASSICAL_PMIS.json:31 interp_max_elements=4) — without it
        # coarse operators densify (L2 at 169 nnz/row needed 90 GS colors
        # = 90 SpMVs/sweep; chip breakdown round 5)
        "interp_max_elements": 4,
        "structure_reuse_levels": -1,
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 64,
        "max_levels": 12, "cycle": "V",
        "dense_threshold_rows": 4096}}


def phase_amg_classical(n_side: int):
    """BASELINE row 2: Poisson-7pt classical AMG (PMIS + D2 interpolation,
    multicolor Gauss-Seidel smoothing), fp64-class accuracy.

    Round-3's rc=1 root cause (BENCH_NOTES r4): the *unrolled* color loop
    made the V-cycle program huge, and emulated f64 runs ~240x slower than
    f32 (measured 3.9 s/iter vs 16 ms/iter at 32^3) — 100 fused f64
    iterations blew the remote worker's watchdog, surfacing as a "kernel
    fault". Color loops now run as lax.fori_loop and the fp64 story is:

      headline  — f32 fused V-cycles + f64 iterative refinement
                  (SURVEY 7.3 dDFI analog) converged to 1e-8 in TRUE f64
                  residual;
      dddi      — honest emulated-f64 fused run, few iterations, at the
                  same 48^3 (per-iteration wall time of real dDDI);
      f64_ref   — pure-f64 CPU run of the identical config for iteration
                  parity.
    """
    import amgx_tpu as amgx
    import jax
    jax.config.update("jax_enable_x64", True)
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float64)
    b = np.ones(a.n_rows)
    out = {"n": a.n_rows, "nnz": a.nnz}

    # -- headline: f32 inner V-cycles + f64 refinement to 1e-8 ------------
    # one RefinedSolver reused across solves (time-stepping contract):
    # the second solve runs entirely on warm compiled programs
    from amgx_tpu.refinement import RefinedSolver
    cfg = amgx.AMGConfig(_classical_cfg("dFFI", True, 20, 1e-6))
    rs = RefinedSolver(cfg, inner_mode="dFFI")
    rs.setup(a)
    t0 = time.perf_counter()
    x, status, hist = rs.solve(b, max_refinements=12, tolerance=1e-8)
    first_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, status, hist = rs.solve(b, max_refinements=12, tolerance=1e-8)
    solve_t = time.perf_counter() - t0
    true_r = float(np.linalg.norm(b - a.to_scipy() @ x) /
                   np.linalg.norm(b))
    out.update({"solve_s": solve_t, "first_solve_s": first_t,
                "status": status, "refinements": len(hist) - 1,
                "rel_resid": true_r, "history": hist[:6]})

    # time-stepping: replace_coefficients + structure-reuse resetup +
    # refined solve (round-5 device value-update path); steady step
    try:
        a0 = np.array(a.data)
        step_t = None
        for it in range(3):
            t0 = time.perf_counter()
            rs.resetup(a0 * (1.0 + 0.01 * (it + 1)))
            rs.solve(b, max_refinements=12, tolerance=1e-8)
            step_t = time.perf_counter() - t0
        out["timestep_s"] = step_t
    except Exception as e:                         # noqa: BLE001
        out["timestep_error"] = str(e)[:200]

    # setup time of the inner hierarchy, measured separately (second
    # allocation = steady-state / resetup-representative)
    s32 = amgx.SolverFactory.allocate(cfg)
    a32 = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
    t0 = time.perf_counter()
    s32.setup(amgx.Matrix(a32, mode="dFFI"))
    out["setup_s"] = time.perf_counter() - t0
    s32b = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s32b.setup(amgx.Matrix(a32, mode="dFFI"))
    out["setup_warm_s"] = time.perf_counter() - t0
    del s32b
    s32v, _ = s32.solve(np.ones(a32.n_rows, np.float32))  # compile
    t0 = time.perf_counter()
    s32.solve(np.ones(a32.n_rows, np.float32))
    out["f32_cycle_solve_s"] = time.perf_counter() - t0
    out["f32_cycle_iters"] = s32.last_iters
    print(json.dumps(out), flush=True)

    # -- honest dDDI: emulated f64 on device, few iterations. NOT fused:
    # emulated f64 runs ~12 s/iter at 48^3, and several iterations inside
    # one lax.while_loop program exceed the remote worker's execution
    # watchdog (the round-3 "kernel fault"); per-iteration dispatch costs
    # ~28 ms against that — noise
    cfg64 = amgx.AMGConfig(_classical_cfg("dDDI", False, 2, 1e-30))
    s64 = amgx.SolverFactory.allocate(cfg64)
    t0 = time.perf_counter()
    s64.setup(amgx.Matrix(a, mode="dDDI"))
    setup64 = time.perf_counter() - t0
    s64.solve(b)                      # compile
    t0 = time.perf_counter()
    s64.solve(b)
    dt = time.perf_counter() - t0
    out["dddi"] = {"setup_s": setup64, "solve_s": dt,
                   "iters": s64.last_iters,
                   "s_per_iter": dt / max(1, s64.last_iters),
                   "note": "emulated f64 (no Mosaic 64-bit lowering)"}
    print(json.dumps(out), flush=True)

    # -- f64 iteration parity: same config, pure f64, CPU backend ---------
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase",
         "classical_f64_cpu", str(n_side)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "AMGX_BENCH_PLATFORM": "cpu"})
    for line in reversed(r.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            out["f64_ref"] = json.loads(line)
            break
    print(json.dumps(out))


def phase_classical_f64_cpu(n_side: int):
    """Pure-f64 classical AMG on the CPU backend: the iteration-parity
    reference for the mixed-precision route."""
    import amgx_tpu as amgx
    import jax
    jax.config.update("jax_enable_x64", True)
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float64)
    cfg = amgx.AMGConfig(_classical_cfg("dDDI", False, 100, 1e-8))
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode="dDDI"))
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    print(json.dumps({"iters": s.last_iters, "status": status,
                      "rel_resid": (h[-1] / h[0]) if h and h[0] else None,
                      "backend": "cpu f64"}))


def phase_toy():
    """The reference's only published benchmark (README.md:100-112):
    examples/matrix.mtx (12 rows, 61 nnz) with FGMRES_AGGREGATION.json —
    setup 1.00 ms / solve 0.689 ms / 9 iters / resid 1.65e-13 on its GPU.
    Steady-state (warm program cache, as in a time-stepping loop)."""
    import amgx_tpu as amgx
    import jax
    jax.config.update("jax_enable_x64", True)
    from amgx_tpu import capi
    amgx.initialize()
    _, cfg = capi.AMGX_config_create_from_file(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "amgx_tpu/configs/FGMRES_AGGREGATION.json"))
    _, rsrc = capi.AMGX_resources_create_simple(cfg)
    _, mh = capi.AMGX_matrix_create(rsrc, "dDDI")
    _, bh = capi.AMGX_vector_create(rsrc, "dDDI")
    _, xh = capi.AMGX_vector_create(rsrc, "dDDI")
    mtx = "/root/reference/examples/matrix.mtx"
    if not os.path.exists(mtx):
        print(json.dumps({"error": "reference matrix.mtx not found"}))
        return
    capi.AMGX_read_system(mh, bh, xh, mtx)
    _, sh = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(sh, mh)          # warm-up (compiles)
    capi.AMGX_solver_solve_with_0_initial_guess(sh, bh, xh)
    setup_best = solve_best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        capi.AMGX_solver_setup(sh, mh)
        setup_best = min(setup_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        capi.AMGX_solver_solve_with_0_initial_guess(sh, bh, xh)
        solve_best = min(solve_best, time.perf_counter() - t0)
    _, x = capi.AMGX_vector_download(xh)
    r = float(np.linalg.norm(bh.data - mh.csr.to_scipy() @ x))
    _, iters = capi.AMGX_solver_get_iterations_number(sh)
    print(json.dumps({
        "setup_ms": round(setup_best * 1e3, 3),
        "solve_ms": round(solve_best * 1e3, 3),
        "iters": iters, "true_resid": r,
        "reference": {"setup_ms": 1.00, "solve_ms": 0.689, "iters": 9,
                      "final_resid": 1.651436e-13}}))


def phase_eigen(n_side: int):
    """BASELINE row 5: LANCZOS (largest eigenvalue of Poisson-7pt, checked
    against the analytic value) and PageRank power iteration, on the
    single-chip eigensolver substrate."""
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
    out = {"n": a.n_rows, "nnz": a.nnz}
    cfg = amgx.AMGConfig(
        "eig_solver=LANCZOS, eig_max_iters=60, "
        "eig_tolerance=1e-6, eig_which=largest")
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(a, mode="dFFI"))
    t0 = time.perf_counter()
    evals, _ = es.solve()            # includes device compile
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    evals, _ = es.solve()            # steady state (warm program cache)
    dt = time.perf_counter() - t0
    lam = float(np.atleast_1d(np.asarray(evals))[0])
    # 7-pt Laplacian: lambda_max = 12 sin^2(N pi / (2(N+1)))
    exact = 12.0 * np.sin(n_side * np.pi / (2.0 * (n_side + 1))) ** 2
    out["lanczos"] = {"lambda_max": lam, "exact": float(exact),
                      "rel_err": abs(lam - exact) / exact,
                      "time_s": dt, "first_time_s": dt_first,
                      "iters": es.last_iters}
    # PageRank on a synthetic directed graph (power iteration via the
    # PagerankOperator substrate)
    rng = np.random.default_rng(0)
    ng = max(2048, a.n_rows // 8)
    deg = 8
    rows = np.repeat(np.arange(ng), deg)
    cols = rng.integers(0, ng, size=ng * deg)
    from amgx_tpu.matrix import CSRMatrix
    g = CSRMatrix.from_coo(ng, ng, rows, cols,
                           np.ones(ng * deg, np.float32))
    cfg2 = amgx.AMGConfig(
        "eig_solver=SINGLE_ITERATION, eig_max_iters=200, "
        "eig_tolerance=1e-8, eig_which=pagerank, eig_damping_factor=0.85")
    es2 = amgx.EigenSolverFactory.allocate(cfg2)
    es2.setup(amgx.Matrix(g, mode="dFFI"))
    es2.pagerank_setup(amgx.Matrix(g, mode="dFFI"))
    t0 = time.perf_counter()
    es2.solve()                      # includes device compile
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    es2.solve()                      # steady state
    out["pagerank"] = {"n": ng, "time_s": time.perf_counter() - t0,
                       "first_time_s": t_first, "iters": es2.last_iters}
    print(json.dumps(out))


def phase_scaling(n_side: int, n_dev: int):
    """nnz/s scaling efficiency 1 -> n_dev shards over the available devices
    (BASELINE: >=80 percent from 1 chip to N hosts). On a single-chip/CPU
    run this validates the harness; real efficiency needs a multi-chip
    mesh."""
    import jax
    import amgx_tpu as amgx
    from amgx_tpu.distributed import DistributedSolver
    from amgx_tpu.distributed.solve import make_mesh
    n_avail = len(jax.devices())
    n_dev = min(n_dev, n_avail)
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
    b = np.ones(a.n_rows, np.float32)
    # honesty: a single chip or a virtual CPU mesh validates the harness
    # only — nnz/s here is NOT a multi-chip scaling measurement
    harness_only = (n_dev <= 1
                    or jax.devices()[0].platform != "tpu")
    out = {"n": a.n_rows, "nnz": a.nnz, "devices_used": n_dev,
           "harness_only": harness_only}
    for nd in ([1, n_dev] if n_dev > 1 else [1]):
        mesh = make_mesh(nd)
        cfg = amgx.AMGConfig("solver=PCG, max_iters=50, tolerance=1e-20, "
                             "convergence=RELATIVE_INI, mode=dFFI, "
                             "monitor_residual=1")
        s = DistributedSolver(cfg, mesh)
        s.setup(a)
        s.solve(b)                       # compile
        t0 = time.perf_counter()
        s.solve(b)
        dt = time.perf_counter() - t0
        out[str(nd)] = {"solve_s": dt,
                        "nnz_per_s": a.nnz * s.last_iters / dt}
    if n_dev > 1:
        out["efficiency"] = out[str(n_dev)]["nnz_per_s"] / (
            out["1"]["nnz_per_s"] * n_dev)
    print(json.dumps(out))


_PHASES = {
    "device": (phase_device, ()),
}


def _run_phase(name: str, args, deadline_s: int):
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", name] + \
        [str(a) for a in args]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=deadline_s)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": f"no output (rc={out.returncode})",
                "stderr": out.stderr[-400:]}
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {deadline_s}s"}
    except Exception as e:                      # noqa: BLE001
        return {"error": str(e)}


def main():
    dev = _run_phase("device", (), 240)
    if "kind" not in dev:
        time.sleep(60)                 # tunneled TPU workers heal slowly
        dev = _run_phase("device", (), 240)
    if "kind" not in dev and not os.environ.get("AMGX_BENCH_PLATFORM"):
        # tunnel unreachable: force the CPU backend for the remaining
        # phases so they measure instead of hanging through every deadline
        os.environ["AMGX_BENCH_PLATFORM"] = "cpu"
        dev = _run_phase("device", (), 240)
        dev["tpu_unreachable"] = True
    kind = dev.get("kind", "unknown")
    on_tpu = dev.get("platform") == "tpu"
    if on_tpu:
        dia_args, gat_args, amg_args = (128, 50, 4), (96, 20, 3), (48,)
        deadlines = (900, 900, 900)
    else:
        dia_args, gat_args, amg_args = (24, 10, 2), (24, 10, 2), (16,)
        deadlines = (300, 300, 420)
    spmv_dia = _run_phase("spmv_dia", dia_args, deadlines[0])
    spmv_gather = _run_phase("spmv_gather", gat_args, deadlines[1])
    amg = _run_phase("amg", amg_args, deadlines[2])
    amg_cla = _run_phase("amg_classical",
                         (48,) if on_tpu else (16,), deadlines[2])
    toy = _run_phase("toy", (), 420)
    eig = _run_phase("eigen", (64,) if on_tpu else (16,), 600)
    scaling = _run_phase("scaling", (32 if on_tpu else 12, 8), 900)
    candidates = [r for r in (spmv_dia, spmv_gather) if "gbps" in r]
    sol = _hbm_gbps(kind)
    if candidates:
        best = max(candidates, key=lambda r: r["gbps"])
        value = round(best["gbps"], 2)
        vsb = round(best["gbps"] / sol, 4)
    else:
        value, vsb = 0.0, 0.0
    # full dump -> file; the FINAL stdout line stays compact (the driver
    # tails stdout into a bounded buffer — BENCH_r03/r04 "parsed": null
    # came from the detail dict overflowing it)
    detail = {"device": kind, "hbm_sol_gbps": sol,
              "tpu_unreachable": bool(dev.get("tpu_unreachable")),
              "spmv_dia": spmv_dia, "spmv_gather": spmv_gather,
              "amg_pcg": amg, "amg_classical": amg_cla,
              "toy_vs_reference": toy, "eigen": eig,
              "scaling": scaling}
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump({"metric": "spmv_gbps", "value": value, "unit": "GB/s",
                   "vs_baseline": vsb, "detail": detail}, f, indent=1)

    def r3(x):
        return round(x, 4) if isinstance(x, (int, float)) else None

    summary = {
        "dia_gbps": r3(spmv_dia.get("gbps")),
        "gather_eff_gbps": r3(spmv_gather.get("gbps")),
        "gather_raw_gbps": r3(spmv_gather.get("raw_gbps")),
        "pcg_solve_s": r3(amg.get("solve_s")),
        "pcg_iters": amg.get("iters"),
        "cla_solve_s": r3(amg_cla.get("solve_s")),
        "cla_first_s": r3(amg_cla.get("first_solve_s")),
        "cla_setup_warm_s": r3(amg_cla.get("setup_warm_s")),
        "cla_timestep_s": r3(amg_cla.get("timestep_s")),
        "pcg_timestep_s": r3(amg.get("timestep_s")),
        "toy_solve_ms": r3((toy or {}).get("solve_ms")),
        "lanczos_s": r3((eig.get("lanczos") or {}).get("time_s"))
        if isinstance(eig.get("lanczos"), dict) else None,
    }
    print(json.dumps({
        "metric": "spmv_gbps",
        "value": value,
        "unit": "GB/s",
        "vs_baseline": vsb,
        "summary": summary,
        "detail_file": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    if os.environ.get("AMGX_BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms",
                          os.environ["AMGX_BENCH_PLATFORM"])
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        name = sys.argv[2]
        args = [int(a) for a in sys.argv[3:]]
        {"device": phase_device, "spmv_dia": phase_spmv_dia,
         "spmv_ell": phase_spmv_ell, "spmv_gather": phase_spmv_gather,
         "amg": phase_amg, "amg_classical": phase_amg_classical,
         "classical_f64_cpu": phase_classical_f64_cpu,
         "toy": phase_toy, "eigen": phase_eigen,
         "scaling": phase_scaling}[name](*args)
    else:
        main()
