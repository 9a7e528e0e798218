"""BLAS-1 and norms on device vectors.

Replaces base/src/blas.cu and base/src/norm.cu. Vectors are flat jnp arrays
padded to the operator's padded row count; the padding invariant (pad region
stays exactly zero through every operator/axpy) lets reductions run over the
whole array without masking. Distributed variants (psum over the mesh) live
in amgx_tpu.distributed.comms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def axpy(y, x, alpha):
    return y + alpha * x


def axpby(x, y, alpha, beta):
    return alpha * x + beta * y


def axmb(op, x, b):
    """r = A x - b (reference: base/src/blas.cu axmb)."""
    return op.apply(x) - b


def dot(x, y, axis_name=None):
    d = jnp.vdot(x, y)
    if axis_name is not None:
        d = jax.lax.psum(d, axis_name)
    return d


def nrm1(x, axis_name=None):
    n = jnp.sum(jnp.abs(x))
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
    return n


def nrm2(x, axis_name=None):
    sq = jnp.vdot(x, x)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    return jnp.sqrt(sq.real if jnp.iscomplexobj(x) else sq)


def nrmmax(x, axis_name=None):
    n = jnp.max(jnp.abs(x)) if x.size else jnp.asarray(0.0, x.dtype)
    if axis_name is not None:
        n = jax.lax.pmax(n, axis_name)
    return n


def get_norm(x, norm: str = "L2", block_dim: int = 1, use_scalar: bool = True,
             axis_name=None):
    """Norm dispatch (reference: base/src/norm.cu:56-190 get_norm).

    With ``use_scalar=False`` and block vectors, returns per-block-component
    norms (shape (block_dim,)) as the reference's block norms do.
    """
    if use_scalar or block_dim == 1:
        if norm == "L1":
            return nrm1(x, axis_name)
        if norm in ("L2",):
            return nrm2(x, axis_name)
        if norm == "LMAX":
            return nrmmax(x, axis_name)
        if norm == "L1_SCALED":
            return nrm1(x, axis_name) / x.size
        raise ValueError(f"Unknown norm {norm}")
    xb = x.reshape(-1, block_dim)
    if norm == "L1":
        n = jnp.sum(jnp.abs(xb), axis=0)
    elif norm == "L2":
        n = jnp.sqrt(jnp.sum(xb * xb, axis=0))
    elif norm == "LMAX":
        n = jnp.max(jnp.abs(xb), axis=0)
    elif norm == "L1_SCALED":
        n = jnp.sum(jnp.abs(xb), axis=0) / xb.shape[0]
    else:
        raise ValueError(f"Unknown norm {norm}")
    if axis_name is not None:
        n = jax.lax.psum(n * n, axis_name) ** 0.5 if norm == "L2" else \
            jax.lax.psum(n, axis_name)
    return n


# ---------------------------------------------------------------------------
# padding helpers
# ---------------------------------------------------------------------------

def pad_to(n: int, m: int = 8) -> int:
    return max(m, ((n + m - 1) // m) * m)


def pad_vector(v, n_pad: int):
    """Pad a host/device 1-D vector with zeros to length n_pad."""
    v = jnp.asarray(v).reshape(-1)
    if v.shape[0] == n_pad:
        return v
    if v.shape[0] > n_pad:
        raise ValueError(f"vector of length {v.shape[0]} > padded {n_pad}")
    return jnp.pad(v, (0, n_pad - v.shape[0]))


def unpad_vector(v, n: int):
    return np.asarray(v)[:n]
