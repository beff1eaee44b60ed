"""Device mesh construction and batch sharding.

The reference is single-GPU (SURVEY.md §2.4: no distributed code exists);
this layer is the green-field scaling plane specified by the north star:
stereo-pair batches shard over the 'data' axis with psum-reduced gradients
over ICI, and the memory-dominant cost volume optionally shards its H axis
over the 'model' axis (the spatial/sequence-parallel analog — XLA inserts
halo exchanges for the 3D convolutions automatically).

Multi-host: call jax.distributed.initialize() before make_mesh (DCN only
crosses hosts for the same collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'model') axes. data defaults to n_devices/model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array with its batch axis sharded over 'data'."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P(DATA_AXIS)))
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def cost_volume_spec(mesh: Mesh) -> P:
    """Sharding for the (B, D, H, W, 2C) cost volume: batch over 'data',
    H over 'model' (spatial parallelism of the memory giant)."""
    return P(DATA_AXIS, None, MODEL_AXIS)
