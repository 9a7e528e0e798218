"""Parameter catalog.

Registers the solver/AMG/system knobs with defaults, descriptions and
validation, mirroring the registry built by the reference at init
(reference: core/src/core.cu:331-560 registerParameters). Only parameters
that are meaningful on TPU are registered; CUDA-specific ones keep their
names (so reference configs parse) but are treated as inert hints.
"""

from .config import register_parameter as P


def register_all_parameters() -> None:
    # -- top-level solver selection -----------------------------------------
    P("solver", str, "PCG", "outer solver algorithm")
    P("preconditioner", str, "NOSOLVER", "preconditioner solver")
    P("smoother", str, "BLOCK_JACOBI", "relaxation scheme used inside AMG")
    P("coarse_solver", str, "DENSE_LU_SOLVER", "solver for the coarsest level")
    P("solver_verbose", int, 0, "print solver-specific information")

    # -- iteration control / convergence -------------------------------------
    P("max_iters", int, 100, "maximum outer iterations", allowed_range=(0, None))
    P("min_iters", int, 0, "minimum iterations before convergence is declared",
      allowed_range=(0, None))
    P("tolerance", float, 1e-12, "convergence tolerance",
      allowed_range=(0.0, None))
    P("alt_rel_tolerance", float, 1e-12,
      "relative tolerance of the COMBINED_REL_INI_ABS criterion")
    P("convergence", str, "ABSOLUTE", "convergence criterion",
      allowed_values=["ABSOLUTE", "RELATIVE_INI", "RELATIVE_INI_CORE",
                      "RELATIVE_MAX", "RELATIVE_MAX_CORE",
                      "COMBINED_REL_INI_ABS"])
    P("norm", str, "L2", "norm used for convergence checks",
      allowed_values=["L1", "L2", "LMAX", "L1_SCALED"])
    P("use_scalar_norm", int, 0,
      "treat block systems as scalar for norm computation",
      allowed_values=[0, 1])
    P("monitor_residual", int, 0, "compute the residual norm every iteration",
      allowed_values=[0, 1])
    P("store_res_history", int, 0, "keep per-iteration residual norms",
      allowed_values=[0, 1])
    P("obtain_timings", int, 0, "measure setup/solve wall times",
      allowed_values=[0, 1])
    P("print_solve_stats", int, 0, "print per-iteration residual table",
      allowed_values=[0, 1])
    P("print_grid_stats", int, 0, "print the AMG level table",
      allowed_values=[0, 1])
    P("print_config", int, 0, "echo the parsed configuration")
    P("verbosity_level", int, 3, "0 quiet .. 3 everything",
      allowed_range=(0, 3))
    P("store_res_history_window", int, 0, "unused compatibility knob")

    # -- AMG hierarchy ---------------------------------------------------------
    P("algorithm", str, "CLASSICAL", "coarsening family",
      allowed_values=["CLASSICAL", "AGGREGATION", "ENERGYMIN"])
    P("max_levels", int, 100, "maximum number of AMG levels",
      allowed_range=(1, None))
    P("min_coarse_rows", int, 2, "stop coarsening below this many rows",
      allowed_range=(1, None))
    P("coarsen_threshold", float, 1.0,
      "stop when coarsening slows below this rate")
    P("min_fine_rows", int, 1, "minimum rows to keep coarsening")
    P("presweeps", int, 1, "pre-smoothing sweeps", allowed_range=(0, None))
    P("postsweeps", int, 1, "post-smoothing sweeps", allowed_range=(0, None))
    P("coarsest_sweeps", int, 1, "smoothing sweeps on the coarsest level when "
      "no coarse solver is used", allowed_range=(0, None))
    P("finest_sweeps", int, -1,
      "override sweep count on the finest level (-1 = use pre/postsweeps)")
    P("intensive_smoothing", int, 0, "multiply sweep counts on coarse levels",
      allowed_values=[0, 1])
    P("cycle", str, "V", "multigrid cycle shape",
      allowed_values=["V", "W", "F", "CG", "CGF"])
    P("cycle_iters", int, 2, "inner iterations for CG/CGF cycles")
    P("dense_lu_num_rows", int, 128,
      "switch to dense LU when a level has fewer rows")
    P("dense_lu_max_rows", int, 0,
      "hard cap on dense-LU size (0 = unlimited)")
    P("structure_reuse_levels", int, 0,
      "levels whose P/R structure is reused on resetup (0=none, -1=all)")
    P("amg_host_levels_rows", int, -1,
      "rows below which levels run on host (-1 disables)")
    P("error_scaling", int, 0, "scale coarse-grid correction",
      allowed_range=(0, 3))
    P("interp_max_elements", int, -1,
      "truncate interpolation rows to this many entries (-1 = off)")
    P("interp_truncation_factor", float, -1.0,
      "truncate interpolation entries below factor*max (-1 = off)")

    # -- classical coarsening ---------------------------------------------------
    P("selector", str, "PMIS", "coarse-point selector / aggregation selector",
      allowed_values=["PMIS", "HMIS", "AGGRESSIVE_PMIS", "AGGRESSIVE_HMIS",
                      "CR", "DUMMY",
                      "SIZE_2", "SIZE_4", "SIZE_8", "MULTI_PAIRWISE",
                      "PARALLEL_GREEDY_SELECTOR", "SERIAL_GREEDY_BFS",
                      "ADAPTIVE", "GEO"])
    P("strength", str, "AHAT", "strength-of-connection metric",
      allowed_values=["AHAT", "ALL", "AFFINITY"])
    P("strength_threshold", float, 0.25,
      "theta for strong connections", allowed_range=(0.0, 1.0))
    P("affinity_iterations", int, 4, "smoothing iterations for AFFINITY")
    P("affinity_vectors", int, 4, "test vectors for AFFINITY")
    P("interpolator", str, "D1", "classical interpolation operator",
      allowed_values=["D1", "D2", "MULTIPASS", "EM"])
    P("max_row_sum", float, 1.1, "rows with |row sum|/|diag| above this are "
      "treated as weakly coupled", allowed_range=(0.0, None))
    P("aggressive_levels", int, 0,
      "apply aggressive coarsening to the first N levels")
    P("aggressive_selector", str, "DEFAULT",
      "selector used on aggressive levels",
      allowed_values=["DEFAULT", "AGGRESSIVE_PMIS", "AGGRESSIVE_HMIS"])
    P("aggressive_interpolator", str, "MULTIPASS",
      "interpolator on aggressive levels")

    # -- aggregation coarsening ---------------------------------------------------
    P("max_matching_iterations", int, 15,
      "handshake iterations for pairwise aggregation")
    P("max_unassigned_percentage", float, 0.05,
      "stop matching when this few nodes remain unaggregated")
    P("aggregation_edge_weight_component", int, 0,
      "block component used for matching weights")
    P("coarseAgenerator", str, "LOW_DEG", "Galerkin product implementation",
      allowed_values=["LOW_DEG", "THRUST", "HYBRID"])
    P("matrix_halo_exchange", int, 0, "distributed coarse-matrix halo policy",
      allowed_range=(0, 2))
    P("full_ghost_level", int, 0, "keep full ghost rows on coarse levels")
    P("aggregation_passes", int, 3,
      "for selector=MULTI_PAIRWISE: each pass about doubles the size of "
      "each aggregate", allowed_range=(1, None))
    P("serial_matching", int, 0, "deterministic serial matching",
      allowed_values=[0, 1])
    P("modified_handshake", int, 0, "use modified handshaking",
      allowed_values=[0, 1])
    P("weight_formula", int, 0, "edge-weight formula for MULTI_PAIRWISE")
    P("ghost_offdiag_limit", int, 0, "MULTI_PAIRWISE ghost filtering")
    P("merge_singletons", int, 1, "merge unaggregated singletons into "
      "neighbouring aggregates", allowed_range=(0, 2))

    # -- smoother knobs --------------------------------------------------------
    P("relaxation_factor", float, 0.9, "smoother damping/relaxation factor "
      "(reference default 0.9, core.cu:421)", allowed_range=(0.0, 2.0))
    P("smooth_with_0_initial_guess", int, 0,
      "skip the initial SpMV when x0 = 0", allowed_values=[0, 1])
    P("jacobi_iters", int, 1, "inner Jacobi iterations")
    P("GS_L1_variant", int, 0, "use the L1 variant of Gauss-Seidel",
      allowed_values=[0, 1])
    P("symmetric_GS", int, 0, "symmetric (fwd+bwd) Gauss-Seidel sweeps",
      allowed_values=[0, 1])
    P("gs_inner_sweeps", int, 2,
      "inner Jacobi sweeps approximating the GS triangular solve "
      "(TWO_STAGE_GS, TPU extension)")
    P("gs_max_colors", int, 0,
      "cap color-sequential GS sweeps at this many merged super-colors "
      "(0 = exact coloring). Dense coarse operators can need 30-90 "
      "colors and each color costs one SpMV on TPU; merging trades a "
      "little smoothing quality for a bounded sweep cost — the same "
      "approximation as the reference's FIXCOLOR_GS (fixed 4 colors) "
      "and approximate colorings (max_uncolored_percentage)")
    P("cf_smoothing_mode", int, 0, "C/F ordering mode for CF_JACOBI",
      allowed_range=(0, 3))
    P("ilu_sparsity_level", int, 0, "ILU(k) fill level", allowed_range=(0, 1))
    P("insert_diag_while_reordering", int, 0, "compat knob",
      allowed_values=[0, 1])
    P("reorder_cols_by_color", int, 0,
      "reorder matrix columns by color (needed by DILU/ILU on the reference; "
      "inert hint on TPU)", allowed_values=[0, 1])
    P("kaczmarz_coloring_needed", int, 1, "use multicolor Kaczmarz",
      allowed_values=[0, 1])

    # -- chebyshev -----------------------------------------------------------
    P("chebyshev_polynomial_order", int, 5, "Chebyshev polynomial order",
      allowed_range=(0, 10))
    P("chebyshev_lambda_estimate_mode", int, 0,
      "0: power iteration on D^-1 A, 1: power iteration, 2: user provided",
      allowed_range=(0, 2))
    P("cheby_max_lambda", float, 1.0, "user-provided largest eigenvalue")
    P("cheby_min_lambda", float, 0.125, "user-provided smallest eigenvalue")
    P("chebyshev_eigenvalue_maxits", int, 10,
      "power-iteration steps for the lambda estimate")

    # -- krylov -----------------------------------------------------------------
    P("gmres_n_restart", int, 20, "GMRES restart length",
      allowed_range=(1, None))
    P("gmres_krylov_dim", int, 0, "cap on stored Krylov vectors (0 = restart)")
    P("subspace_dim_s", int, 4, "IDR(s) shadow-space dimension",
      allowed_range=(1, None))
    P("print_vis_data", int, 0, "compat")

    # -- matrix coloring ---------------------------------------------------------
    P("matrix_coloring_scheme", str, "PARALLEL_GREEDY",
      "coloring algorithm",
      allowed_values=["MIN_MAX", "MIN_MAX_2RING", "GREEDY_MIN_MAX_2RING",
                      "PARALLEL_GREEDY", "SERIAL_GREEDY_BFS", "GREEDY_RECOLOR",
                      "MULTI_HASH", "ROUND_ROBIN", "UNIFORM",
                      "LOCALLY_DOWNWIND"])
    P("coloring_level", int, 1, "distance of the coloring (0 disables)",
      allowed_range=(0, 3))
    P("max_uncolored_percentage", float, 0.15,
      "allowed fraction of uncolored rows", allowed_range=(0.0, 1.0))
    P("num_colors", int, 10, "target/maximum number of colors")
    P("coloring_try_remove_last_colors", int, 0, "recoloring compat knob")
    P("coloring_custom_arg", str, "", "scheme-specific argument")
    P("initial_color", int, 0, "first color index")
    P("boundary_coloring", str, "SYNC_COLORS", "distributed coloring policy",
      allowed_values=["FIRST", "SYNC_COLORS", "LAST"])
    P("halo_coloring", str, "LAST", "halo coloring policy",
      allowed_values=["FIRST", "SYNC_COLORS", "LAST"])

    # -- scalers ------------------------------------------------------------------
    P("scaling", str, "NONE", "equation scaling applied before the solve",
      allowed_values=["NONE", "DIAGONAL_SYMMETRIC", "BINORMALIZATION",
                      "NBINORMALIZATION"])
    P("scaling_iterations", int, 10, "iterations for binormalization")

    # -- eigensolvers ------------------------------------------------------------
    P("eig_solver", str, "SINGLE_ITERATION", "eigensolver method",
      allowed_values=["SINGLE_ITERATION", "LANCZOS", "ARNOLDI",
                      "SUBSPACE_ITERATION", "LOBPCG", "JACOBI_DAVIDSON"])
    P("eig_max_iters", int, 100, "eigensolver iteration cap")
    P("eig_tolerance", float, 1e-6, "eigensolver tolerance")
    P("eig_which", str, "largest", "eigenvalue selection",
      allowed_values=["largest", "smallest", "pagerank", "shift"])
    P("eig_shift", float, 0.0, "spectral shift (A - shift I)")
    P("eig_wanted_count", int, 1, "number of eigenpairs")
    P("eig_eigenvector", int, 1, "compute eigenvectors")
    P("eig_eigenvector_solver", str, "", "inverse-iteration refinement config")
    P("eig_damping_factor", float, 0.85, "PageRank damping factor")
    P("eig_krylov_dim", int, 20, "Krylov dimension for Lanczos/Arnoldi")

    # -- distributed -------------------------------------------------------------
    P("communicator", str, "MESH", "communication backend",
      allowed_values=["MESH", "MPI", "MPI_DIRECT"])
    P("num_import_rings", int, 1, "halo ring count", allowed_range=(1, 2))
    P("min_rows_latency_hiding", int, -1,
      "enable interior/boundary overlap above this local row count")
    P("distributed_aggregation", str, "SHARD_LOCAL",
      "distributed AMG aggregation scope: SHARD_LOCAL aggregates each "
      "shard's owned rows (reference semantics — aggregates never span "
      "ranks; transfers become halo-free), GLOBAL aggregates the global "
      "matrix then re-partitions",
      allowed_values=["SHARD_LOCAL", "GLOBAL"])
    P("matrix_consolidation_lower_threshold", int, 0,
      "consolidate a level when average rows/rank drops below this")
    P("matrix_consolidation_upper_threshold", int, 1000,
      "row target per rank after consolidation")
    P("use_cuda_ipc_consolidation", int, 0, "inert on TPU")
    P("fine_level_consolidation", int, 0, "consolidate the fine level")
    P("fine_level_reordering", str, "AUTO",
      "reorder the user's fine matrix for the banded TPU layouts: AUTO "
      "applies RCM only when the given ordering is neither stencil- nor "
      "band-structured; solve vectors are permuted at the API boundary",
      allowed_values=["NONE", "AUTO", "RCM"])
    P("partition_vec_size", int, 0, "compat")
    P("complex_conversion", int, 0,
      "convert a complex system read from file to a real one: 1..4 = "
      "scalar K1..K4 formulation of 2x size, 221..224 = same-size system "
      "of 2x2 real blocks (reference core.cu:381, readers.cu:244-476)",
      allowed_values=[0, 1, 2, 3, 4, 221, 222, 223, 224])

    # -- system / resources (inert hints kept for config compatibility) ---------
    P("determinism_flag", int, 0, "force deterministic algorithm variants",
      allowed_values=[0, 1])
    P("exception_handling", int, 0, "translate exceptions to error codes",
      allowed_values=[0, 1])
    P("num_streams", int, 0, "inert on TPU")
    P("serialize_threads", int, 0, "inert on TPU")
    P("high_priority_stream", int, 0, "inert on TPU")
    P("device_mem_pool_size", int, 0, "inert on TPU")
    P("device_consolidation_pool_size", int, 0, "inert on TPU")
    P("device_mem_pool_max_alloc_size", int, 0, "inert on TPU")
    P("device_alloc_scaling_factor", int, 10, "inert on TPU")
    P("device_alloc_scaling_threshold", int, 16384, "inert on TPU")
    P("spmm_max_attempts", int, 6, "inert on TPU (hash SpGEMM retries)")
    P("reuse_scale", int, 0, "reuse the error-scaling factor across cycles")
    P("scaling_smoother_steps", int, 2, "smoother steps inside scalers")
    P("rap_truncate_factor", float, -1.0,
      "drop RAP entries below factor*row max (-1 = off)")
    P("config_version", int, 2, "config schema version")

    # -- precision / mode ----------------------------------------------------------
    P("mode", str, "dDDI", "precision mode (memspace, vecPrec, matPrec, indPrec)",
      allowed_values=["hDDI", "hDFI", "hFFI", "dDDI", "dDFI", "dFFI",
                      "hZZI", "hZCI", "hCCI", "dZZI", "dZCI", "dCCI",
                      "dFBI16", "dBBI16"])
    P("block_format", str, "ROW_MAJOR", "block value layout",
      allowed_values=["ROW_MAJOR", "COL_MAJOR"])

    # -- kernel / performance knobs (TPU-specific additions) -----------------------
    P("spmv_impl", str, "AUTO", "SpMV backend",
      allowed_values=["AUTO", "PALLAS", "XLA", "DENSE"])
    P("dense_threshold_rows", int, 0,
      "use dense (MXU) operators for levels with fewer rows than this "
      "(0 = disabled)")
    P("ell_row_bucket", int, 4, "ELL width is rounded up to a multiple of this")
    P("fused_solve", int, 1,
      "run the whole iteration loop inside one jitted while_loop when "
      "printing is off", allowed_values=[0, 1])


register_all_parameters()
