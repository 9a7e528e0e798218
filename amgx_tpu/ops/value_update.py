"""Device-side value-only operator updates (time stepping).

A values-only resetup (`replace_coefficients` + structure reuse) used to
rebuild every level's device layout on the host and re-upload it — ~200 MB
of strips/packs per step, which through a remote-TPU tunnel costs seconds
(chip-measured: a 48^3 classical resetup's first solve paid +1.7 s of
deferred uploads). With the same sparsity, only the VALUES change, and
every layout is a static scatter of the value stream: so each builder
attaches an *update plan* (the flat scatter indices, once, device-
resident) and a resetup uploads just the new nnz values (~4 B/nnz) and
scatters them into the layout on device.

Reference analog: AMGX_matrix_replace_coefficients reuses the device
structure and only copies values (matrix.cu replace_coefficients).
"""

from __future__ import annotations

import zlib
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def csr_structure_sig(csr, dtype) -> tuple:
    """Cheap structural fingerprint: an update plan built for one
    structure must never be applied to another (crc over the index
    arrays; ~1 GB/s, microseconds at hierarchy sizes)."""
    return (csr.n_rows, csr.n_cols, int(csr.nnz), str(np.dtype(dtype)),
            tuple(csr.block_dim),
            zlib.crc32(np.ascontiguousarray(csr.indptr,
                                            np.int64).view(np.uint8)),
            zlib.crc32(np.ascontiguousarray(csr.indices,
                                            np.int32).view(np.uint8)),
            csr.diag_data is not None)


@partial(jax.jit, static_argnums=(2, 3), donate_argnums=())
def _scatter_flat(vals, idx, size: int, dtype_name: str):
    flat = jnp.zeros((size,), jnp.dtype(dtype_name))
    return flat.at[idx].set(vals.astype(jnp.dtype(dtype_name)))


def attach_plan(op, kind: str, sig: tuple, flat_idx: np.ndarray,
                size: int) -> None:
    """Stash the scatter plan on the op instance. Plans live OUTSIDE the
    pytree protocol: they follow the host-held op object, never the
    traced operands. The index array stays HOST-side until the first
    update (an eager device_put costs a full tunnel round trip per op
    build otherwise); _scatter_flat uploads it with the values in one
    dispatch."""
    op._vu = {"kind": kind, "sig": sig,
              "idx": np.ascontiguousarray(flat_idx, np.int32),
              "size": int(size)}


def _stream_for(kind: str, csr) -> Optional[np.ndarray]:
    """The value stream matching the builder's edge order ("dia" and
    "g5" have bespoke streams in try_value_update)."""
    if kind == "ell":
        if csr.diag_data is not None:
            return np.concatenate([csr.data, csr.diag_data])
        return csr.data
    if kind in ("band", "dense"):
        return csr.data
    return None


def try_value_update(donor, csr, dtype):
    """Return a NEW op with updated values (device scatter) when the
    donor's plan matches this csr's structure, else None."""
    plan = getattr(donor, "_vu", None)
    if plan is None:
        return None
    if plan["sig"] != csr_structure_sig(csr, dtype):
        return None
    kind = plan["kind"]
    if kind == "dia":
        # fold changes the stream length — the sig was computed on the
        # raw csr, the plan's idx on the folded stream; recompute fold
        stream = csr.fold_diagonal().data
    elif kind == "g5":
        stream = csr.data if csr.diag_data is None else \
            np.concatenate([csr.data, csr.diag_data])
        if np.count_nonzero(stream) != stream.shape[0]:
            return None               # the pack drops zero entries
        stream = stream[plan["src"]]  # pair-sort permutation (host)
    else:
        stream = _stream_for(kind, csr)
    if stream is None or stream.shape[0] != plan["idx"].shape[0]:
        return None
    if not isinstance(plan["idx"], jax.Array):
        # lazy one-time promotion; the shared plan dict keeps it for
        # every later step
        plan["idx"] = jax.device_put(plan["idx"])
    flat = _scatter_flat(jnp.asarray(np.ascontiguousarray(stream)),
                         plan["idx"], plan["size"],
                         str(np.dtype(dtype)))
    new = _rebuild(donor, kind, flat)
    if new is not None:
        new._vu = plan
    return new


def _rebuild(donor, kind: str, flat):
    from ..matrix import EllMatrix, DenseOperator
    from .spmv import DiaMatrix
    from .band import BandMatrix
    if kind == "dia" and isinstance(donor, DiaMatrix):
        bands = flat.reshape(donor.bands.shape)
        return DiaMatrix(list(donor.offsets), bands, donor.n_rows,
                         donor.n_cols, nnz=donor.nnz)
    if kind == "band" and isinstance(donor, BandMatrix):
        strips = flat.reshape(donor.strips.shape)
        return BandMatrix(strips, donor.base, donor.n_rows, donor.n_cols,
                          donor.nnz, donor.x_pad)
    if kind == "ell" and isinstance(donor, EllMatrix):
        vals = flat.reshape(donor.vals.shape)
        return EllMatrix(donor.cols, vals, donor.n_rows, donor.n_cols,
                         donor.block_dim, nnz=donor.nnz)
    if kind == "dense" and isinstance(donor, DenseOperator):
        return DenseOperator(flat.reshape(donor.a.shape), donor.n_rows,
                             donor.n_cols, donor.block_dim)
    from .gather_spmv import GatherMatrix
    if kind == "g5" and isinstance(donor, GatherMatrix):
        arrays = {k: getattr(donor, k) for k in donor.ARRAY_FIELDS}
        arrays["vals"] = flat.reshape(donor.vals.shape)
        return GatherMatrix(arrays, donor.meta)
    return None
