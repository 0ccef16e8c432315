"""Device mesh + sharding rules — the TPU-native replacement for DDP/NCCL.

Reference parallelism is exactly one strategy: data-parallel DDP over NCCL
(src/train.py:141-159, SURVEY.md §2.9). Here: a 1-D ``data`` mesh; batch
tensors shard on axis 0, parameters/optimizer state replicate. Under ``jit``
the gradient mean materializes as an XLA psum over ICI — no hand-written
collectives, and none of the reference's wrap-then-unwrap DDP fragility.

Beyond DP, the ``model`` mesh axis can carry **spatial partitioning** of the
image height (``spatial_batch_sharding``): [B, T, H, W, C] tensors shard on
H, parameters stay replicated, and XLA's SPMD partitioner inserts the conv
halo exchanges over ICI automatically. This is the scaling story for the
512x1024 long-horizon config, where activations — not weights — exceed a
chip (SURVEY.md §5 "long context"): batch-1 clips split across chips
without any model surgery. Validated on the virtual CPU mesh by
tests/test_parallel.py and ``__graft_entry__.dryrun_multichip``'s spatial
variant.
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


def spatial_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch on ``data``; image HEIGHT on ``model`` (spatial partitioning).

    Only the 5-d video streams [B, T, H, W, C] carry a height axis in the
    loader's batch; every other tensor (graph nodes [B, N, F], thetas
    [B, N, T, 6], rois) shards on batch only — inside ``jit`` the SPMD
    partitioner propagates the height sharding to the folded/flat
    activations on its own.
    """
    if ndim >= 5:
        return NamedSharding(mesh, P("data", None, "model"))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                spatial: bool = False) -> Dict[str, Any]:
    if not spatial:
        s = data_sharding(mesh)
        return {k: jax.device_put(v, s) for k, v in batch.items()}
    return {k: jax.device_put(v, spatial_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()}


def shard_state(state, mesh: Mesh):
    """Replicate params/opt state across the mesh (pure data parallelism;
    spatial partitioning also replicates weights — only activations split)."""
    s = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)
