"""Stratified Transformer uncertainty decoder for the PDF recognizer.

Reference: pointcept/recognizers/recognizer_model/st_v1m1.py:30-69 — a
second upsample ladder that starts from the backbone bottleneck and, at
each step, blends the main decoder's output at the finer level
(``support_feats``) with a 3-NN interpolation of its own running feats,
ending in a 1-channel confidence MLP.  Consumes the ST backbone's
``enc*``/``up*`` intermediates instead of forward hooks.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.builder import MODELS
from ...models.norm import MaskedBatchNorm
from ...models.stratified_transformer.st import Upsample


@MODELS.register_module("ST-v1m1-Recognizer")
class STRecognizer(nn.Module):
    up_k: int
    channels: Sequence[int]
    num_layers: int

    @nn.compact
    def __call__(self, intermediates: Dict, train: bool = True) -> jnp.ndarray:
        n_up = self.num_layers - 1
        feat, coord, mask = intermediates[f"enc{self.num_layers - 1}"]
        for step, i in enumerate(range(self.num_layers - 1, 0, -1)):
            support_feat, support_coord, support_mask = intermediates[
                f"up{step}"
            ]
            feat = Upsample(
                self.up_k, self.channels[i], self.channels[i - 1],
                name=f"up{step}",
            )(feat, coord, mask, support_feat, support_coord, support_mask,
              train)
            coord, mask = support_coord, support_mask
        y = nn.Dense(self.channels[0], name="conf_fc1")(feat)
        y = MaskedBatchNorm(self.channels[0], name="conf_bn")(y, mask, train)
        y = nn.relu(y)
        conf = nn.Dense(1, name="conf_fc2")(y)
        return jnp.where(mask[..., None], conf, 0.0)
