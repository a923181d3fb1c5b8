"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
