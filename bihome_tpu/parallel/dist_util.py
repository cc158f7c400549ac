"""Distributed helpers — single-controller JAX equivalents of the
reference's torch.distributed utilities (ref: src/utils/dist_util.py:7-96).

| reference (torch.distributed) | here (JAX single-controller) |
|---|---|
| get_world_size()              | jax.process_count()           |
| get_rank()                    | jax.process_index()           |
| is_main_process()             | process_index() == 0          |
| synchronize() barrier         | multihost_utils sync barrier  |
| all_gather(pickled data)      | process_allgather on pytrees  |

On a single host these degrade to no-ops, exactly like the reference when
torch.distributed is not initialized.
"""

from __future__ import annotations

from typing import Any, List

import jax


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (no-op single-host, ref: dist_util.py:39-56)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('bihome_tpu_sync')


def all_gather(data: Any) -> List[Any]:
    """Gather a host-local pytree from every process
    (ref: dist_util.py:59-96 pickles tensors; here pytrees of arrays)."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(data)
    world = jax.process_count()
    return [jax.tree_util.tree_map(lambda x: x[i], gathered)
            for i in range(world)]
