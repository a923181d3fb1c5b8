"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: repeated test runs skip XLA recompiles.
# It lives in the repo tree (gitignored) — /tmp is wiped between rounds,
# a repo-anchored cache stays warm across them.
_TEST_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _TEST_CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import functools

import numpy as np
import pytest

# Correctness-only CI: XLA's optimization pipeline dominates compile time
# on this box (a PT-v1 train step drops from >570s to ~25s) and tests only
# check numerics within tolerances, so run with most optimizations off.
import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; only the config
# flag actually forces the CPU backend in this image
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# -- jitted module helpers ----------------------------------------------------
# Eager flax init/apply dispatches every op separately; on this 1-core CI
# box that is ~20x slower than compiling the whole program, so tests always
# go through jit (which also exercises the real execution path).

def jit_init(model, rngs, *args, **static_kwargs):
    import jax

    return jax.jit(functools.partial(model.init, **static_kwargs))(rngs, *args)


def jit_apply(model, variables, *args, rngs=None, **static_kwargs):
    import jax

    fn = jax.jit(functools.partial(model.apply, **static_kwargs))
    if rngs is not None:
        return fn(variables, *args, rngs=rngs)
    return fn(variables, *args)
