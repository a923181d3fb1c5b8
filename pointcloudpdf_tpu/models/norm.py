"""Masked normalization layers for padded point batches.

The reference uses torch BatchNorm1d over packed (sum_N, C) points; padded
batches need statistics over *valid* points only, so this BatchNorm takes
an explicit mask. Under jit with a sharded batch, the mean/variance
reductions are global (GSPMD inserts the collectives), which subsumes the
reference's optional SyncBatchNorm (engines/train.py:213-214) for free.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading dims with a validity mask.

    x: (..., C); mask: broadcastable to x.shape[:-1] (True = valid).
    ``momentum`` follows the torch convention: running = (1-m)*old + m*new.

    ``setup``-style so fused-kernel callers can use :meth:`train_affine`
    with externally computed batch statistics (ops/pallas_attention.py
    training path) while `__call__` keeps the reference semantics.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    def setup(self):
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        self.scale = (
            self.param("scale", nn.initializers.ones, (self.features,))
            if self.use_scale
            else 1.0
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else 0.0
        )

    def _update_running(self, mean, var, cnt):
        # unbiased running variance, biased normalization (torch)
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        m = self.momentum
        self.ra_mean.value = (1 - m) * self.ra_mean.value + m * mean
        self.ra_var.value = (1 - m) * self.ra_var.value + m * unbiased

    def train_affine(self, mean, var, cnt):
        """Training-mode BN as a folded affine over EXTERNAL batch stats.

        ``mean``/``var`` are the masked biased batch statistics computed
        by the caller (e.g. from a fused kernel's payload); running stats
        update exactly as __call__ would.  Returns ``(scale, shift)`` with
        ``y = x * scale + shift`` — differentiable through mean/var, so
        the batch-stat backward coupling flows via autodiff.
        """
        var = jnp.maximum(var, 0.0)
        if not self.is_initializing():
            self._update_running(mean, var, cnt)
        inv = jax.lax.rsqrt(var + self.epsilon) * self.scale
        return inv, self.bias - mean * inv

    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = True,
                 context: Optional[jnp.ndarray] = None):
        # ``context`` is accepted (and ignored) so plain and prompt-driven
        # norms share one call convention inside conditional backbones
        ra_mean = self.ra_mean
        ra_var = self.ra_var
        scale = self.scale
        bias = self.bias

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
                self._update_running(mean, var, cnt)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean) * inv + bias
        return y.astype(x.dtype)

class PDMaskedBatchNorm(nn.Module):
    """Prompt-driven (per-dataset) masked BatchNorm.

    Re-expression of the reference PDBatchNorm
    (pointcept/models/sparse_unet/spconv_unet_v1m3_pdnorm.py:25-74 and
    point_prompt_training/prompt_driven_normalization.py): decoupled mode
    keeps one BatchNorm per dataset condition.  Instead of a ModuleList
    selected at runtime, the per-condition statistics and affine params
    live in stacked ``(num_conditions, C)`` banks indexed by the *static*
    ``condition`` attribute — one compiled executable per dataset, a fixed
    parameter tree across all of them, and only the active condition's
    running stats are updated.  Adaptive mode modulates the normalized
    features with ``(1 + scale, shift)`` projected from the dataset
    context embedding (SiLU + Dense, zero-initialised so training starts
    at identity — the reference's zero_init).
    """

    features: int
    conditions: Sequence[str]
    condition: Optional[str] = None
    decouple: bool = True
    adaptive: bool = False
    affine: bool = True
    context_channels: int = 256
    momentum: float = 0.01
    epsilon: float = 1e-3
    zero_init: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = True,
                 context: Optional[jnp.ndarray] = None):
        n_bank = len(self.conditions) if self.decouple else 1
        if self.decouple:
            assert self.condition in self.conditions, self.condition
            ci = tuple(self.conditions).index(self.condition)
        else:
            ci = 0

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((n_bank, self.features), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((n_bank, self.features), jnp.float32),
        )
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (n_bank, self.features)
            )[ci]
            bias = self.param(
                "bias", nn.initializers.zeros, (n_bank, self.features)
            )[ci]
        else:
            scale, bias = 1.0, 0.0

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                w = jnp.ones(x.shape[:-1], jnp.float32)
            else:
                w = jnp.broadcast_to(mask, x.shape[:-1]).astype(jnp.float32)
            wexp = w[..., None]
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            red = tuple(range(x.ndim - 1))
            mean = jnp.sum(xf * wexp, axis=red) / cnt
            var = jnp.sum(jnp.square(xf) * wexp, axis=red) / cnt - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ra_mean.value.at[ci].set(
                    (1 - self.momentum) * ra_mean.value[ci] + self.momentum * mean
                )
                ra_var.value = ra_var.value.at[ci].set(
                    (1 - self.momentum) * ra_var.value[ci] + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value[ci], ra_var.value[ci]

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean) * inv + bias

        if self.adaptive:
            assert context is not None, "adaptive PDNorm needs a context"
            w_init = (
                nn.initializers.zeros if self.zero_init
                else nn.initializers.truncated_normal(stddev=0.02)
            )
            mod = nn.Dense(
                2 * self.features, kernel_init=w_init, name="modulation"
            )(nn.silu(context.reshape(-1)))
            shift, mscale = jnp.split(mod, 2)
            y = y * (1.0 + mscale) + shift

        return y.astype(x.dtype)

class PDLayerNorm(nn.Module):
    """Prompt-driven LayerNorm: per-condition affine banks (+ optional
    adaptive context modulation), the LN counterpart of PDMaskedBatchNorm
    (reference prompt_driven_normalization.py with norm_layer=LayerNorm,
    used by PT-v3's pdnorm_ln)."""

    features: int
    conditions: Sequence[str]
    condition: Optional[str] = None
    decouple: bool = True
    adaptive: bool = False
    affine: bool = True
    context_channels: int = 256
    epsilon: float = 1e-6
    zero_init: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = True,
                 context: Optional[jnp.ndarray] = None):
        n_bank = len(self.conditions) if self.decouple else 1
        if self.decouple:
            assert self.condition in self.conditions, self.condition
            ci = tuple(self.conditions).index(self.condition)
        else:
            ci = 0
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (n_bank, self.features)
            )[ci]
            bias = self.param(
                "bias", nn.initializers.zeros, (n_bank, self.features)
            )[ci]
            y = y * scale + bias
        if self.adaptive:
            assert context is not None, "adaptive PDNorm needs a context"
            w_init = (
                nn.initializers.zeros if self.zero_init
                else nn.initializers.truncated_normal(stddev=0.02)
            )
            mod = nn.Dense(
                2 * self.features, kernel_init=w_init, name="modulation"
            )(nn.silu(context.reshape(-1)))
            shift, mscale = jnp.split(mod, 2)
            y = y * (1.0 + mscale) + shift
        return y.astype(x.dtype)
