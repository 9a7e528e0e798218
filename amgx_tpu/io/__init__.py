from .matrix_market import read_system, write_system, read_matrix_market, \
    write_matrix_market  # noqa: F401
from .binary import read_system_binary, write_system_binary  # noqa: F401
from .complex_conversion import convert_complex_system  # noqa: F401
