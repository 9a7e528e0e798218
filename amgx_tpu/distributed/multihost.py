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


gathered_bytes = 0      # cumulative per-process allgather payload
max_gather_bytes = 0    # largest single payload: tests assert this stays
                        # boundary-sized (an O(N) regression ships the
                        # operator in one call)


def allgather_host(arr: np.ndarray) -> list:
    """Gather a variable-length 1-D host array from every process; returns
    the per-process arrays in process order (single process: ``[arr]``).

    The reference's per-rank upload paths move rank-local CSR pieces with
    MPI point-to-point (distributed_manager.cu:1144, distributed_io.cu);
    here rank-local host data rides one byte-padded ``process_allgather``
    (any dtype, lengths may differ per process)."""
    global gathered_bytes, max_gather_bytes
    arr = np.ascontiguousarray(arr)
    gathered_bytes += arr.nbytes
    max_gather_bytes = max(max_gather_bytes, arr.nbytes)
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


# ---------------------------------------------------------------------------
# Rank-local setup fabric (O(N/P) per process)
# ---------------------------------------------------------------------------
# The reference keeps each rank's partition rank-local and exchanges only
# neighbour-sized matrix structure (loadDistributedMatrix,
# distributed_manager.cu:1144/1359; comms_mpi_hostbuffer_stream.cu:835-990).
# JAX exposes no host point-to-point, so the analog here is: publish
# boundary-sized payloads with one process_allgather round and let each
# process pick what it owns/requested. Traffic per round is
# O(sum of boundaries), never O(N).

def allgather_nd(arr: np.ndarray, trailing_shape=()) -> list:
    """allgather_host for arrays with fixed trailing dims: each process
    contributes (k_p, *trailing_shape); returns the per-process arrays."""
    arr = np.ascontiguousarray(arr).reshape((-1,) + tuple(trailing_shape))
    flat = allgather_host(arr.reshape(-1))
    tsz = int(np.prod(trailing_shape, dtype=np.int64)) if trailing_shape \
        else 1
    return [a.reshape((-1,) + tuple(trailing_shape)) if tsz else a
            for a in flat]


def allreduce_scalar(val: float, op=max) -> float:
    """Cross-process scalar all-reduce (identity in single-process runs)."""
    if not is_multiprocess():
        return float(val)
    return op(float(v[0]) for v in allgather_host(
        np.asarray([val], np.float64)))


def allreduce_union(arr: np.ndarray) -> np.ndarray:
    """Sorted union of a small int array across processes."""
    if not is_multiprocess():
        return np.unique(arr)
    return np.unique(np.concatenate(allgather_host(np.asarray(arr))))


def put_stacked(rows_by_dev: dict, n_dev: int, row_shape, dtype,
                mesh: Mesh, axis: str = "x"):
    """Per-device rows -> (n_dev, *row_shape) array sharded over the mesh
    axis. ``rows_by_dev`` maps global device index -> host row; each
    process supplies ONLY its addressable devices' rows, so per-process
    host memory stays O(N/P) (the reference's rank-local device upload,
    distributed_manager.cu:1144). Missing local rows are zero-filled."""
    shape = (int(n_dev),) + tuple(int(s) for s in row_shape)
    sh = NamedSharding(mesh, P(axis))
    if not is_multiprocess():
        out = np.zeros(shape, dtype)
        for d, v in rows_by_dev.items():
            out[d] = np.asarray(v, dtype)
        return jax.device_put(out, sh)
    pid = jax.process_index()
    arrs = []
    for d, dev in enumerate(mesh.devices.flat):
        if dev.process_index != pid:
            continue
        v = rows_by_dev.get(d)
        row = np.zeros(shape[1:], dtype) if v is None else \
            np.ascontiguousarray(np.asarray(v, dtype))
        arrs.append(jax.device_put(row[None], dev))
    return jax.make_array_from_single_device_arrays(shape, sh, arrs)


def gather_per_dev(n_dev: int, local: dict) -> list:
    """Assemble a full per-device list from each process's {dev: np.ndarray}
    contributions (device indices are globally unique). Single process:
    just places the dict into a list."""
    out = [None] * n_dev
    if not is_multiprocess():
        for d, v in local.items():
            out[d] = v
        return out
    devs = np.asarray(sorted(local.keys()), np.int64)
    if devs.size:
        vals = [np.ascontiguousarray(np.asarray(local[int(d)]))
                for d in devs]
        lens = np.asarray([v.reshape(-1).view(np.uint8).size for v in vals],
                          np.int64)
        blob = np.concatenate([v.reshape(-1).view(np.uint8) for v in vals])
    else:
        lens = np.zeros(0, np.int64)
        blob = np.zeros(0, np.uint8)
    # dtype/shape descriptors ride along as strings (same for all devs of
    # one call site, but processes may hold devices with distinct shapes)
    descs = ["|".join([str(np.asarray(local[int(d)]).dtype)] +
                      [str(int(x))
                       for x in np.asarray(local[int(d)]).shape])
             for d in devs]
    desc_blob = np.frombuffer(("\x00".join(descs)).encode(), np.uint8)
    all_devs = allgather_host(devs)
    all_lens = allgather_host(lens)
    all_blob = allgather_host(blob)
    all_desc = allgather_host(desc_blob)
    for p in range(len(all_devs)):
        descs_p = bytes(all_desc[p]).decode().split("\x00") \
            if all_desc[p].size else []
        off = 0
        for j, d in enumerate(all_devs[p]):
            parts = descs_p[j].split("|")
            dt, shape = parts[0], tuple(int(x) for x in parts[1:])
            nb = int(all_lens[p][j])
            out[int(d)] = all_blob[p][off:off + nb].view(
                np.dtype(dt)).reshape(shape)
            off += nb
    return out
