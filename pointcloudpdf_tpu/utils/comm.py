"""Cross-process communication primitives.

Reference contract (pointcept/utils/comm.py:23-198: NCCL/gloo world
queries, object gather). On TPU, in-step tensor collectives are GSPMD's
job; these helpers cover the *host-side* needs: world/rank queries via the
JAX runtime and picklable-object allgather via multihost utils when
running multi-process, degrading to identity in single-process runs.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pointcloudpdf_tpu.barrier")


def all_gather(data: Any) -> List[Any]:
    """Gather a picklable object from every process (gloo-gather parity)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes()) for i in range(world)
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather objects on one rank (others get [])."""
    results = all_gather(data)
    return results if get_rank() == dst else []


def shared_random_seed() -> int:
    """A seed shared across all processes (reference comm.py:158-170)."""
    seed = np.random.randint(2**31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Reduce scalar dict values across processes (mean by default)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    gathered = all_gather(input_dict)
    out = {}
    for key in input_dict:
        total = sum(float(d[key]) for d in gathered)
        out[key] = total / world if average else total
    return out
