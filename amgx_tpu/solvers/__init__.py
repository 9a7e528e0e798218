from .base import Solver, SolverFactory, SolveStatus  # noqa: F401

# import concrete solvers for registration side effects
from . import krylov, smoothers, chebyshev, dense_lu, dummy, amg_wrapper, \
    multicolor, idr, kaczmarz, polynomial  # noqa: F401
