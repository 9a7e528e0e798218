from .base import EigenSolver, EigenSolverFactory, AMGEigenSolver  # noqa
from . import methods  # noqa: F401  (registration side effects)
