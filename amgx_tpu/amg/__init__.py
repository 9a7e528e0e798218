from .hierarchy import AMG, AMGLevel  # noqa: F401
