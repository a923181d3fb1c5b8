"""Launcher: single- and multi-host SPMD entry.

The reference forks one process per GPU and wires NCCL
(engines/launch.py:36-137). On TPU, one process drives all local chips via
XLA, so launch() simply initializes the distributed JAX runtime when a
multi-host environment is configured and calls main_func inline — SPMD
parallelism happens inside jit, not across forked workers.
"""

from __future__ import annotations

import os

from ..utils.logger import get_root_logger


def launch(
    main_func,
    num_gpus_per_machine: int = 1,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url=None,
    cfg=(),
):
    logger = get_root_logger()
    if num_machines > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or (
            dist_url.replace("tcp://", "") if dist_url else None
        )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
        logger.info(
            f"Initialized JAX distributed: process {machine_rank}/{num_machines}"
        )
    main_func(*cfg)
