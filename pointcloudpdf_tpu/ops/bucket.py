"""Padded-batch packing: the TPU-native replacement for offset packing.

The reference packs variable-length samples as one concatenated (sum_N, C)
tensor plus a cumulative ``offset`` vector (pointcept/datasets/utils.py:15-41).
XLA wants static shapes, so our canonical batch is a dense (B, N_pad, C)
buffer plus a (B,) ``count`` vector and the implied (B, N_pad) validity
mask. These helpers convert between the two layouts (numpy, host side) and
compute masks (jnp, device side).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def pad_to_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (last bucket caps/clips)."""
    for b in sorted(buckets):
        if length <= b:
            return b
    return sorted(buckets)[-1]


def pack_padded(
    arrays: List[np.ndarray],
    n_pad: int,
    pad_value: float = 0.0,
) -> np.ndarray:
    """Stack variable-length (N_i, ...) numpy arrays into (B, n_pad, ...).

    Samples longer than n_pad are truncated (callers should crop upstream
    via SphereCrop so this is a safety net, not a sampling strategy).
    """
    B = len(arrays)
    trailing = arrays[0].shape[1:]
    out = np.full((B, n_pad) + trailing, pad_value, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        n = min(a.shape[0], n_pad)
        out[i, :n] = a[:n]
    return out


def counts_from_arrays(arrays: List[np.ndarray], n_pad: int) -> np.ndarray:
    return np.array([min(a.shape[0], n_pad) for a in arrays], dtype=np.int32)


def mask_from_count(count: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(B,) count -> (B, n_pad) bool validity mask (jit-able)."""
    return jnp.arange(n_pad)[None, :] < count[:, None]


def offsets_from_count(count: np.ndarray) -> np.ndarray:
    """(B,) count -> reference-style cumulative offsets (B,)."""
    return np.cumsum(np.asarray(count)).astype(np.int32)


def unpack_padded(batched: np.ndarray, count: np.ndarray) -> List[np.ndarray]:
    """(B, n_pad, ...) + counts -> list of (N_i, ...) arrays."""
    return [np.asarray(batched[i, : int(count[i])]) for i in range(len(count))]


def flatten_valid(batched: np.ndarray, count: np.ndarray) -> np.ndarray:
    """(B, n_pad, ...) + counts -> reference-style packed (sum_N, ...)."""
    return np.concatenate(unpack_padded(batched, count), axis=0)
