from .partition import RowPartition, DistEllMatrix  # noqa: F401
from .solve import DistributedSolver  # noqa: F401
