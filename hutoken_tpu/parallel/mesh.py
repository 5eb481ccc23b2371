"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the ``data`` axis (all local/global devices)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, array, axis: int = 0):
    """Place ``array`` sharded along ``axis`` over the data mesh axis."""
    spec = [None] * array.ndim
    spec[axis] = "data"
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))
