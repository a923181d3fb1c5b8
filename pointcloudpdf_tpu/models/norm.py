"""Masked normalization layers for padded point batches.

The reference uses torch BatchNorm1d over packed (sum_N, C) points; padded
batches need statistics over *valid* points only, so this BatchNorm takes
an explicit mask. Under jit with a sharded batch, the mean/variance
reductions are global (GSPMD inserts the collectives), which subsumes the
reference's optional SyncBatchNorm (engines/train.py:213-214) for free.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading dims with a validity mask.

    x: (..., C); mask: broadcastable to x.shape[:-1] (True = valid).
    ``momentum`` follows the torch convention: running = (1-m)*old + m*new.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = True):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = (
            self.param("scale", nn.initializers.ones, (self.features,))
            if self.use_scale
            else 1.0
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else 0.0
        )

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                w = jnp.ones(x.shape[:-1], jnp.float32)
            else:
                w = jnp.broadcast_to(mask, x.shape[:-1]).astype(jnp.float32)
            wexp = w[..., None]
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(xf * wexp, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum(jnp.square(xf) * wexp, axis=tuple(range(x.ndim - 1))) / cnt
                - jnp.square(mean)
            )
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                # unbiased running variance, biased normalization (torch)
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean) * inv + bias
        return y.astype(x.dtype)
