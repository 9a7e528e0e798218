"""Matrix format converter — the analog of the reference's
examples/convert.c: read a system in MatrixMarket (+%%NVAMG extensions)
or NVAMG binary format and write it back in the other.

    python examples/convert.py in.mtx out.bin
    python examples/convert.py in.bin out.mtx
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import amgx_tpu as amgx
from amgx_tpu import io as aio


def _read(path):
    if path.endswith(".bin"):
        return aio.read_system_binary(path)
    return aio.read_system(path)


def _write(path, a, b, x):
    if path.endswith(".bin"):
        aio.write_system_binary(path, a, b, x)
    else:
        aio.write_system(path, a, b, x)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(1)
    import jax
    jax.config.update("jax_platforms", "cpu")   # pure host IO
    src, dst = sys.argv[1], sys.argv[2]
    amgx.initialize()
    a, b, x = _read(src)
    _write(dst, a, b, x)
    kind = "binary" if dst.endswith(".bin") else "MatrixMarket"
    print(f"{src} -> {dst} ({kind}): {a.n_rows} rows, {a.nnz} nnz"
          + ("" if b is None else ", rhs") + ("" if x is None else ", sol"))


if __name__ == "__main__":
    main()
