"""Device mesh + sharding rules — the TPU-native replacement for DDP/NCCL.

Reference parallelism is exactly one strategy: data-parallel DDP over NCCL
(src/train.py:141-159, SURVEY.md §2.9). Here: a 1-D ``data`` mesh; batch
tensors shard on axis 0, parameters/optimizer state replicate. Under ``jit``
the gradient mean materializes as an XLA psum over ICI — no hand-written
collectives, and none of the reference's wrap-then-unwrap DDP fragility.

The mesh helper accepts a ``model`` axis for future intra-op sharding of the
widest layers (reserved; the conv-GAN's weights fit easily on one chip).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    arr = np.array(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: shard axis 0 over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    s = data_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def shard_state(state, mesh: Mesh):
    """Replicate params/opt state across the mesh (pure data parallelism)."""
    s = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)
