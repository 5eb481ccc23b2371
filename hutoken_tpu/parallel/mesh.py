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
    """Place ``array`` sharded along ``axis`` over the data mesh axis.

    Multi-process safe: when the mesh spans processes, every process
    passes the same full host array and each assembles only its
    addressable shards (device_put cannot target non-addressable
    devices)."""
    spec = [None] * array.ndim
    spec[axis] = "data"
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        arr_np = np.asarray(array)
        return jax.make_array_from_callback(
            arr_np.shape, sharding, lambda idx: arr_np[idx]
        )
    return jax.device_put(array, sharding)
