"""Halo exchange over a device mesh axis.

TPU-native replacement for the reference's MPI halo machinery
(reference: Field::syncLocal packing ghost arrays via ScatterMap indices
into Isend/Irecv byte transfers, Field.cpp:234-383; maps owned by
StorageSite, StorageSite.h:23-29).

Here the scatter/gather index maps are baked at partition time into dense
per-peer tables (padded to a uniform max count so shapes are static), and
the exchange itself is one ``jax.lax.all_to_all`` inside ``shard_map`` —
XLA lowers it onto ICI.  Padding slots carry an out-of-range destination
index and are dropped by the scatter (`mode='drop'`).

All HaloSpec leaves are stacked per-device: shape (n_dev, P, M) where
P = number of peers (= n_dev) and M = max transfer count.  Inside
shard_map each device sees its own (1, P, M) slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HaloSpec:
    send_idx: jnp.ndarray  # (n_dev, P, M) local cell ids to send to peer p
    recv_idx: jnp.ndarray  # (n_dev, P, M) local slots for data from peer p
    # padding: send_idx -> 0 (sends garbage, dropped on receive);
    #          recv_idx -> n_cells_local (out of range => dropped)


def halo_exchange(x: jnp.ndarray, spec: HaloSpec, axis_name: str) -> jnp.ndarray:
    """Refresh halo slots of a local cell array (any trailing dims).

    Must be called inside shard_map over ``axis_name``.  ``spec`` leaves
    arrive with a leading length-1 device axis (the shard_map block).
    """
    send_idx = spec.send_idx.reshape(spec.send_idx.shape[-2:])
    recv_idx = spec.recv_idx.reshape(spec.recv_idx.shape[-2:])
    send = x[send_idx]  # (P, M, ...)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0)
    flat_idx = recv_idx.reshape(-1)
    flat = recv.reshape((-1,) + recv.shape[2:])
    # unique_indices: each halo slot receives from exactly one peer; padded
    # entries share the out-of-range index but are dropped (and the scatter
    # TRANSPOSE zero-fills their gather) — this makes the exchange linear-
    # transposable, which reverse-mode (adjoint) solves rely on: the vjp of
    # an all_to_all halo refresh is the reversed exchange that folds halo
    # cotangents back onto their owner cells.
    return x.at[flat_idx].set(flat, mode="drop", unique_indices=True)


def gsum(mesh, v):
    """Global (cross-shard) sum of a local reduction result."""
    if getattr(mesh, "axis_name", None) is not None:
        return jax.lax.psum(v, mesh.axis_name)
    return v


def maybe_sync(mesh, x: jnp.ndarray) -> jnp.ndarray:
    """Halo-sync a cell array if the mesh is distributed; else identity."""
    if getattr(mesh, "halo", None) is not None and mesh.axis_name is not None:
        return halo_exchange(x, mesh.halo, mesh.axis_name)
    return x
