"""Device mesh + sharding helpers (the framework's distributed story).

The reference's only parallelism is single-process DataParallel
(ref: train.py:513-518, SURVEY §2.7). The TPU-native equivalent is
single-controller JAX: one 'data' mesh axis over all chips, batch-sharded
inputs, replicated params; XLA inserts the gradient all-reduce over ICI
(DCN across hosts). ``jax.process_index() == 0`` replaces
``is_main_process()`` (ref: src/utils/dist_util.py:30-36) for logging and
checkpoint gating.

Models here are small CNNs on 128px patches — batch is the only axis worth
sharding (no tensor/pipeline/sequence parallelism in the reference either).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = 'data') -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = 'data') -> Any:
    """device_put a pytree of [B, ...] arrays batch-sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_axis(mesh: Mesh, tree: Any, axis: int,
               axis_name: str = 'data') -> Any:
    """device_put with the given axis sharded (e.g. axis=1 for stacked
    multi-step [K,B,...] image blocks)."""
    sharding = NamedSharding(mesh, P(*([None] * axis + [axis_name])))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def is_main_process() -> bool:
    return jax.process_index() == 0
