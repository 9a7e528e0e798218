"""Multi-host (multi-process) array plumbing.

The SPMD solve programs are host-count-agnostic: `shard_map` over a global
`Mesh` compiles identically whether the mesh's devices live in one process
or many (the reference reaches multi-node scale through MPI ranks,
base/src/distributed/comms_mpi_hostbuffer_stream.cu; here a JAX process
== one host of the slice and XLA collectives ride ICI/DCN).

What does change across processes is host<->device data movement:

  * entry: a host-stacked array (leading axis = global device) must be
    placed with an explicit NamedSharding — each process then materializes
    only its addressable shards (`jax.device_put` of replicated host data
    into a cross-process sharding is supported; every process holds the
    same host value, the reference's "global upload on every rank" path,
    amgx_c.cu upload_all + distributed_io.cu:182).
  * exit: `np.asarray` on a cross-process sharded array fails; fetch via
    `process_allgather` instead (the analog of the reference's
    gather-to-rank-0 + bcast vector download).

Every helper degrades to the plain single-process fast path when
`jax.process_count() == 1`, so the solver code calls them unconditionally.
Host-side setup (AMG coarsening, factorizations) runs redundantly and
deterministically on every process from the same inputs — the replicated-
metadata model; per-shard O(N/P) device state is still only materialized
for addressable devices.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_sharded(arr: np.ndarray, mesh: Mesh, axis: str = "x"):
    """Host (D, ...) stacked array -> jax.Array sharded over the mesh's
    device axis. Works across processes (each materializes only its
    addressable shards)."""
    return jax.device_put(np.asarray(arr), NamedSharding(mesh, P(axis)))


def put_replicated(arr: np.ndarray, mesh: Mesh):
    """Host array -> fully replicated jax.Array on the mesh."""
    return jax.device_put(np.asarray(arr), NamedSharding(mesh, P()))


def to_host(arr) -> np.ndarray:
    """Device array -> host numpy on EVERY process. Single process (or a
    fully addressable array): plain np.asarray. Cross-process sharded:
    one tiled process_allgather."""
    if isinstance(arr, np.ndarray) or not isinstance(arr, jax.Array):
        return np.asarray(arr)
    if arr.is_fully_addressable:
        return np.asarray(arr)
    if arr.is_fully_replicated:
        # every process holds complete copies; read the local one
        return np.asarray(arr.addressable_data(0))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def allgather_host(arr: np.ndarray) -> list:
    """Gather a variable-length 1-D host array from every process; returns
    the per-process arrays in process order (single process: ``[arr]``).

    The reference's per-rank upload paths move rank-local CSR pieces with
    MPI point-to-point (distributed_manager.cu:1144, distributed_io.cu);
    here rank-local host data rides one byte-padded ``process_allgather``
    (any dtype, lengths may differ per process)."""
    arr = np.ascontiguousarray(arr)
    if not is_multiprocess():
        return [arr]
    from jax.experimental import multihost_utils
    raw = arr.view(np.uint8).reshape(-1)
    nbytes = np.asarray(multihost_utils.process_allgather(
        np.array([raw.size], np.int64)))                      # (P, 1)
    cap = max(1, int(nbytes.max()))
    pad = np.zeros(cap, np.uint8)
    pad[:raw.size] = raw
    allb = np.asarray(multihost_utils.process_allgather(pad))  # (P, cap)
    return [allb[p, :int(nbytes[p, 0])].view(arr.dtype)
            for p in range(allb.shape[0])]


def reput(arr, sharding: NamedSharding):
    """Re-place an existing array (possibly local/committed) into a target
    sharding. Cross-process, device_put from device arrays is not always
    supported — detour through host numpy (setup-time only)."""
    if not is_multiprocess():
        return jax.device_put(arr, sharding)
    return jax.device_put(to_host(arr), sharding)
