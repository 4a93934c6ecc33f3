"""NamedSharding helpers: batch-sharded activations, replicated params.

Under ``jax.jit`` with these shardings, XLA inserts the gradient ``psum``
(an ICI all-reduce) automatically — the TPU-native equivalent of the NCCL
all-reduce a torch rebuild would hand-write (SURVEY.md §3.4).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int, *, axis: str = "data", spatial_axis: str | None = None) -> NamedSharding:
    """Shard dim 0 (batch) over ``axis``; optionally dim 1 (H) over ``spatial_axis``."""
    spec = [None] * ndim
    spec[0] = axis
    if spatial_axis is not None and ndim >= 2:
        spec[1] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, *, axis: str = "data", spatial_axis: str | None = None):
    """Device_put every leaf with its batch dim sharded over the mesh."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis=axis, spatial_axis=spatial_axis))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device_put every leaf fully replicated."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
