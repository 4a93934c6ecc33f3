"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    axis_names: tuple[str, ...] = ("data",),
    axis_sizes: tuple[int, ...] | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: a 1-D 'data' mesh over every device (the DP axis). For the
    optional spatial-sharding configs pass e.g. axis_names=('data','space')
    with axis_sizes=(n//2, 2).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis sizes {axis_sizes} do not multiply to device count {n}")
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)
