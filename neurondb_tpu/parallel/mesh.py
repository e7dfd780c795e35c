"""Mesh helpers: build 1-D/2-D device meshes for search/ML sharding."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "shard") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def local_mesh(axes: Sequence[Tuple[str, int]]) -> Mesh:
    """N-D mesh, e.g. local_mesh([("data", 4), ("model", 2)])."""
    shape = tuple(n for _, n in axes)
    names = tuple(a for a, _ in axes)
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def shard_rows(mesh: Mesh, arr, axis: str = "shard"):
    """Place [N, ...] array row-sharded over the mesh axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
