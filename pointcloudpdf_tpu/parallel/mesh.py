"""Device mesh + sharding helpers: the SPMD data-parallel backbone.

TPU-native replacement for the reference's mp.spawn + NCCL DDP stack
(engines/launch.py:36-137, engines/defaults.py:22-43): a 1-D ``data`` mesh
over all devices, batches sharded on their leading dim, parameters
replicated. Gradients need no explicit allreduce — the loss mean over the
sharded batch makes XLA insert the psum (GSPMD), and masked BatchNorm
statistics become globally synced the same way (free SyncBN).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh, sharded over the leading dim.

    Non-array values (strings, lists) pass through untouched; arrays whose
    leading dim is not divisible by the mesh size are replicated instead.
    """
    n_dev = mesh.devices.size
    sharded = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        if x.shape[0] % n_dev == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return {
        k: place(v) if not isinstance(v, (str, list)) else v
        for k, v in batch.items()
    }


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    repl = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)


def local_batch_to_global(batch_size: int, mesh: Mesh) -> int:
    """Assert/compute per-device batch divisibility (reference
    engines/defaults.py:136-145 batch math)."""
    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (
        f"batch_size {batch_size} not divisible by mesh size {n_dev}"
    )
    return batch_size // n_dev
