from . import blas, spmv, spgemm  # noqa: F401
