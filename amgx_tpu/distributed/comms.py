"""Halo exchange and distributed reductions over the device mesh.

Maps the reference's DistributedComms MPI halo exchange
(base/src/distributed/comms_mpi_hostbuffer_stream.cu:354-761) onto XLA
collectives over ICI:

  * pack (gather with the B2L table) -> all_gather over the mesh axis ->
    unpack (gather from the exchanged table). No host bounce — ICI is
    device-to-device.
  * distributed dots/norms = local reduction + psum
    (reference: distributed-aware blas, base/src/blas.cu, norm.cu).

These functions run inside shard_map: array arguments are the per-shard
blocks (leading device axis of size 1 removed by the caller).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(x_local, pack_idx, halo_from, axis: str = "x",
                  perms=None):
    """Return the halo values this shard needs.

    Neighbour mode (``perms`` is a static tuple of ppermute permutations,
    one per shard-offset ring — the reference's per-neighbour
    MPI_Isend/Irecv, comms_mpi_hostbuffer_stream.cu:637-761):
      pack_idx  (n_R, Bmax) — per-ring B2L maps: slots we send on ring k
      halo_from (Hmax,)     — flat indices into the concatenated received
                              buffers (k * Bmax + pos)
    Each ring is one collective-permute over ICI: traffic is O(boundary),
    not O(P * Bmax) like the all_gather fallback.

    All-gather mode (perms is None — used for dense neighbourhoods):
      pack_idx  (Bmax,)  — our B2L map: slots we contribute
      halo_from (Hmax,)  — flat indices into the (D*Bmax) exchanged table
    """
    if perms is not None:
        recvs = [jax.lax.ppermute(x_local[pack_idx[k]], axis, perm)
                 for k, perm in enumerate(perms)]
        table = jnp.concatenate(recvs) if len(recvs) > 1 else recvs[0]
        return table[halo_from]
    buf = x_local[pack_idx]                       # pack     (Bmax,)
    table = jax.lax.all_gather(buf, axis)         # exchange (D, Bmax)
    return table.reshape(-1)[halo_from]           # unpack   (Hmax,)


def extended_vector(x_local, pack_idx, halo_from, axis: str = "x",
                    perms=None):
    """[owned | halo] concatenation the local ELL columns index into."""
    halo = halo_exchange(x_local, pack_idx, halo_from, axis, perms)
    return jnp.concatenate([x_local, halo])


def dist_spmv(cols, vals, pack_idx, halo_from, x_local, axis: str = "x",
              interior_split: int = 0, perms=None):
    """One shard of y = A x with halo exchange (reference: multiply.cu:
    113-197).

    With ``interior_split`` = S > 0 (a static bound: rows [0, S) are
    interior on *every* shard — rows are sorted interior-first), the
    interior product depends only on owned values while the exchange is in
    flight, so XLA's latency-hiding scheduler overlaps the collective with
    interior compute — the reference's async-halo + interior-SpMV pattern
    without streams."""
    if interior_split <= 0:
        xe = extended_vector(x_local, pack_idx, halo_from, axis, perms)
        return jnp.sum(vals * xe[cols], axis=1)
    halo = halo_exchange(x_local, pack_idx, halo_from, axis, perms)
    y_int = jnp.sum(vals[:interior_split] * x_local[cols[:interior_split]],
                    axis=1)
    xe = jnp.concatenate([x_local, halo])
    y_bnd = jnp.sum(vals[interior_split:] * xe[cols[interior_split:]],
                    axis=1)
    return jnp.concatenate([y_int, y_bnd])


def dist_spmv_structured(offsets, bands, margins, hv_top, hc_top, hv_bot,
                         hc_bot, pack_idx, halo_from, x_local,
                         axis: str = "x", perms=None):
    """Shard SpMV for stencil partitions: the owned part runs the no-gather
    DIA shift-FMA (per-chip speed-of-light path); only the margin rows near
    shard edges touch the exchanged halo (reference: interior/boundary
    kernel split, multiply.cu:113-197 — here the interior is also
    layout-optimal)."""
    halo = halo_exchange(x_local, pack_idx, halo_from, axis, perms)
    y = jnp.zeros_like(x_local)
    for k, off in enumerate(offsets):
        y = y + bands[k] * jnp.roll(x_local, -off)
    xe = jnp.concatenate([x_local, halo])
    m_top, m_bot = margins
    if m_top:
        yt = jnp.sum(hv_top * xe[hc_top], axis=1)
        y = y.at[:m_top].add(yt)
    if m_bot:
        yb = jnp.sum(hv_bot * xe[hc_bot], axis=1)
        y = y.at[-m_bot:].add(yb)
    return y


def dist_spmv_band(strips, base_hw, meta, hv_top, hc_top, hv_bot, hc_bot,
                   pack_idx, halo_from, x_local, axis: str = "x",
                   perms=None):
    """Shard SpMV for banded (non-stencil) owned parts: per-tile MXU
    matmuls via the band-strip layout (ops/band.py) — the distributed
    analog of the single-chip BandMatrix path; halo entries live in margin
    rows like the DIA path. ``meta`` = (hw, x_pad, lr_pad, m_top, m_bot)
    is static."""
    from ..ops.band import BandMatrix, band_spmv, band_spmv_pallas
    hw, x_pad, lr_pad, m_top, m_bot = meta
    halo = halo_exchange(x_local, pack_idx, halo_from, axis, perms)
    lr = x_local.shape[0]
    xw = jnp.pad(x_local, (0, x_pad - lr)) if x_pad > lr else \
        x_local[:x_pad]
    bm = BandMatrix(strips, base_hw * hw, lr_pad, x_pad, 0, x_pad)
    if jax.default_backend() == "tpu" and \
            strips.dtype.itemsize <= 4 and x_local.dtype.itemsize <= 4:
        y = band_spmv_pallas(bm, xw)
    else:
        y = band_spmv(bm, xw)
    y = y[:lr]
    xe = jnp.concatenate([x_local, halo])
    if m_top:
        y = y.at[:m_top].add(jnp.sum(hv_top * xe[hc_top], axis=1))
    if m_bot:
        y = y.at[-m_bot:].add(jnp.sum(hv_bot * xe[hc_bot], axis=1))
    return y


def dist_spmv_gather(g5, gmeta, pack_idx, halo_from, x_local,
                     axis: str = "x", perms=None):
    """Shard SpMV for unstructured owned parts via the stacked lane-binned
    gather (G5) packs: exchange -> [owned | halo] concat -> the Pallas
    gather kernel over the shard's pack (halo columns live inside the
    pack at slots >= lc, so no margin-row special casing). The
    distributed analog of the reference's one-SpMV-for-all-sparsity
    (multiply.cu:113-197) with the G5 format supplying the bandwidth."""
    from ..ops.gather_spmv import GatherMatrix
    halo = halo_exchange(x_local, pack_idx, halo_from, axis, perms)
    xe = jnp.concatenate([x_local, halo])
    gm = GatherMatrix(dict(g5), dict(gmeta))
    return gm.apply_rect(xe)


def dist_spmv_block(cols, vals, pack_idx, halo_from, x_local, by: int,
                    axis: str = "x", perms=None):
    """Blocked (BSR) shard SpMV: x_local is flat (L*by,); vals are
    (Lr, W, bx, by); halo exchange moves whole column blocks."""
    xb = x_local.reshape(-1, by)                    # (L, by)
    if perms is not None:
        recvs = [jax.lax.ppermute(xb[pack_idx[k]], axis, perm)
                 for k, perm in enumerate(perms)]
        table = jnp.concatenate(recvs) if len(recvs) > 1 else recvs[0]
        halo = table[halo_from]                     # (Hmax, by)
    else:
        buf = xb[pack_idx]                          # (Bmax, by)
        table = jax.lax.all_gather(buf, axis)       # (D, Bmax, by)
        halo = table.reshape(-1, by)[halo_from]     # (Hmax, by)
    xe = jnp.concatenate([xb, halo], axis=0)        # (L+Hmax, by)
    gathered = xe[cols]                             # (Lr, W, by)
    y = jnp.einsum("rwij,rwj->ri", vals, gathered,
                   preferred_element_type=jnp.result_type(vals, x_local))
    return y.reshape(-1)


def dist_block_spmv(cols, vals, pack_idx, halo_from, X_local,
                    axis: str = "x", perms=None):
    """Shard SpMV applied to a block of k vectors X_local (L, k) with ONE
    halo exchange moving all k columns together (the reference's blocked
    eigensolver matvecs, core/src/eigensolvers/; batching the exchange
    amortizes the per-collective latency k-fold)."""
    if perms is not None:
        recvs = [jax.lax.ppermute(X_local[pack_idx[r]], axis, perm)
                 for r, perm in enumerate(perms)]
        table = jnp.concatenate(recvs) if len(recvs) > 1 else recvs[0]
        halo = table[halo_from]                     # (Hmax, k)
    else:
        buf = X_local[pack_idx]                     # (Bmax, k)
        table = jax.lax.all_gather(buf, axis)       # (D, Bmax, k)
        halo = table.reshape(-1, X_local.shape[1])[halo_from]
    xe = jnp.concatenate([X_local, halo], axis=0)   # (L+Hmax, k)
    return jnp.einsum("rw,rwk->rk", vals, xe[cols])


def dist_dot(a, b, axis: str = "x"):
    return jax.lax.psum(jnp.vdot(a, b), axis)


def dist_nrm2(a, axis: str = "x"):
    # vdot conjugates, so the psum is real for complex modes too; take
    # .real so residual norms stay real-typed (while_loop comparisons)
    return jnp.sqrt(jax.lax.psum(jnp.vdot(a, a), axis).real)


def dist_nrm1(a, axis: str = "x"):
    return jax.lax.psum(jnp.sum(jnp.abs(a)), axis)


def dist_nrmmax(a, axis: str = "x"):
    return jax.lax.pmax(jnp.max(jnp.abs(a)), axis)
