"""Seed plumbing (reference contract: pointcept/utils/env.py:26-36).

On TPU/JAX, determinism comes from explicit PRNG keys; this module provides
the global host-side seeds (numpy / python random) used by the data pipeline
and derives per-worker/per-rank seeds the same way the reference does.
"""

from __future__ import annotations

import os
import random
from datetime import datetime

import numpy as np


def get_random_seed() -> int:
    return (
        os.getpid()
        + int(datetime.now().strftime("%S%f"))
        + int.from_bytes(os.urandom(2), "big")
    ) % (2**31)


def set_seed(seed=None) -> int:
    """Seed python + numpy global RNGs; returns the seed actually used."""
    if seed is None:
        seed = get_random_seed()
    seed = int(seed) % (2**31)
    random.seed(seed)
    np.random.seed(seed % (2**32 - 1))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
