"""Padded point-set structure threaded through backbones.

The reference threads ``[p, x, o]`` (coords, feats, offsets) through every
stage (point_transformer_seg.py:45-46); the TPU-native equivalent is a
static-shape triple of (coord (B,N,3), feat (B,N,C), mask (B,N)) — a pytree
NamedTuple so it jits/vmaps/shards transparently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Points(NamedTuple):
    coord: jnp.ndarray  # (B, N, 3) float32
    feat: jnp.ndarray   # (B, N, C)
    mask: jnp.ndarray   # (B, N) bool — True = real point

    @property
    def batch_size(self):
        return self.coord.shape[0]

    @property
    def capacity(self):
        return self.coord.shape[1]

    def with_feat(self, feat) -> "Points":
        return Points(self.coord, feat, self.mask)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1,
                   neg: float = -1e9) -> jnp.ndarray:
    """Softmax with invalid slots forced to ~zero probability."""
    logits = jnp.where(mask, logits, neg)
    probs = jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True))
    probs = probs * mask.astype(probs.dtype)
    return probs / jnp.maximum(jnp.sum(probs, axis=axis, keepdims=True), 1e-12)


def masked_mean(feat: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Mean of valid features along ``axis``; mask broadcast over channels."""
    w = mask.astype(feat.dtype)[..., None]
    return jnp.sum(feat * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1e-12)


def masked_max(feat: jnp.ndarray, mask: jnp.ndarray, axis: int = -2,
               neg: float = -1e9) -> jnp.ndarray:
    """Max over valid entries along ``axis`` (invalid -> neg)."""
    filled = jnp.where(mask[..., None], feat, neg)
    return jnp.max(filled, axis=axis)
