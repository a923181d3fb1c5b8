"""Prompt-driven normalization (PDNorm).

Reference: pointcept/models/point_prompt_training/
prompt_driven_normalization.py — per-dataset decoupled norms selected by
the (static) condition string, with optional context-adaptive
scale/shift.  The condition is a Python string resolved at trace time
(one compiled executable per dataset condition, like the reference's
module indexing); during init every branch is touched so the param tree
is condition-independent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..norm import MaskedBatchNorm


class PDNorm(nn.Module):
    num_features: int
    conditions: Sequence[str] = ("ScanNet", "S3DIS", "Structured3D")
    context_channels: int = 256
    decouple: bool = True
    adaptive: bool = False
    momentum: float = 0.01
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool, condition: Optional[str] = None,
                 context=None):
        norms = [
            MaskedBatchNorm(self.num_features, momentum=self.momentum,
                            epsilon=self.epsilon, name=f"norm{i}")
            for i in range(len(self.conditions) if self.decouple else 1)
        ]
        if self.decouple:
            idx = (
                self.conditions.index(condition)
                if condition in self.conditions else 0
            )
        else:
            idx = 0
        if self.is_initializing():
            # touch every branch so params/batch_stats exist for all
            # conditions regardless of which one traced first
            for i, n in enumerate(norms):
                if i != idx:
                    n(x, mask, False)
        y = norms[idx](x, mask, train)
        if self.adaptive:
            assert context is not None
            mod = nn.Dense(2 * self.num_features, name="modulation")(
                nn.silu(context)
            )
            shift, scale = jnp.split(mod, 2, axis=-1)
            y = y * (1.0 + scale) + shift
        return y
