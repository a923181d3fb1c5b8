"""PT-v1 uncertainty U-decoder for the PDF recognizer.

Reference: pointcept/recognizers/recognizer_model/pt_v1.py:9-44 — a second
decoder over the frozen backbone's per-stage features (captured there via
forward hooks, here via the backbone's returned ``intermediates`` dict of
Points): five TransitionUp stages walking enc5..enc1 against the main
decoder's outputs dec5..dec1, ending in a 1-channel confidence MLP.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ...models.builder import MODELS
from ...models.norm import MaskedBatchNorm
from ...models.point_transformer.modules import TransitionUp
from ...models.utils.structure import Points

PLANES = (32, 64, 128, 256, 512)


@MODELS.register_module("PointTransformer-Recognizer")
class PTRecognizer(nn.Module):
    """intermediates (enc1..enc5, dec1..dec5 Points) -> confidence (B,N,1)."""

    @nn.compact
    def __call__(self, intermediates: Dict[str, Points],
                 train: bool = True) -> jnp.ndarray:
        enc = [intermediates[f"enc{i}"] for i in range(1, 6)]
        dec = [intermediates[f"dec{i}"] for i in range(1, 6)]

        # r5: dec5 feats refined against enc5 feats at the same coords
        r = TransitionUp(PLANES[4], PLANES[4], name="dec5")(
            Points(enc[4].coord, dec[4].feat, enc[4].mask),
            Points(enc[4].coord, enc[4].feat, enc[4].mask),
            train,
        )
        prev = Points(enc[4].coord, r, enc[4].mask)
        # r4..r1: fuse level-i main-decoder feats with the coarser r
        for level in range(3, -1, -1):
            r = TransitionUp(
                PLANES[level + 1], PLANES[level], name=f"dec{level + 1}"
            )(
                Points(enc[level].coord, dec[level].feat, enc[level].mask),
                prev,
                train,
            )
            prev = Points(enc[level].coord, r, enc[level].mask)

        mask = enc[0].mask
        y = nn.Dense(PLANES[0], name="conf1")(r)
        y = MaskedBatchNorm(PLANES[0], name="conf_bn")(y, mask, train)
        y = nn.relu(y)
        conf = nn.Dense(1, name="conf2")(y)
        return jnp.where(mask[..., None], conf, 0.0)
