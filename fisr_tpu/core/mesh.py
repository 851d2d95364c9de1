"""Device mesh + sharding helpers — the framework's distribution backbone.

The reference's only distribution mechanism is TF1 in-graph GPU towers with
host-side gradient averaging (model_pwcnet.py:254-339). The TPU-native
design expresses everything as shardings over a `jax.sharding.Mesh`:

* axis 'data'    — batch (DP): replicated params, XLA inserts the gradient
                   psum over ICI;
* axis 'spatial' — image width (SP): halo-partitioned spatial parallelism
                   for high-res inference; halos ride ppermute
                   (infer/sharded.py) — the mesh analog of the reference's
                   serial patch tiling (FISRnet.py:846-880).

Meshes work identically on real TPU slices and on
`--xla_force_host_platform_device_count=N` virtual CPU devices (CI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "P"]

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, SPATIAL_AXIS),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the leading axis, 1 on the rest. shape=(2, 4)
    gives a 2-way DP x 4-way spatial mesh.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-axis sharding for an `ndim`-dim array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """device_put every batch array with its batch axis sharded over `axis`."""
    return {
        k: jax.device_put(v, data_sharding(mesh, v.ndim, axis))
        for k, v in batch.items()
    }
