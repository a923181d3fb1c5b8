"""Point Transformer v1 classification backbones.

Reference: pointcept/models/point_transformer/point_transformer_cls.py —
five encoder stages then a masked global mean pool + MLP head. Note the
reference's cls ``_make_enc`` runs ``blocks-1`` residual blocks per stage
(range(1, blocks), point_transformer_cls.py:76-85), reproduced here.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..utils.structure import Points, masked_mean
from .modules import Bottleneck, TransitionDown
from .point_transformer_seg import NSAMPLES, PLANES, SHARE_PLANES, STRIDES


class PointTransformerCls(nn.Module):
    blocks: Sequence[int]
    in_channels: int = 6
    num_classes: int = 40

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True) -> jnp.ndarray:
        coord = input_dict["coord"].astype(jnp.float32)
        mask = input_dict["mask"]
        if self.in_channels == 3:
            feat = coord
        else:
            feat = jnp.concatenate([coord, input_dict["feat"]], axis=-1) if (
                input_dict["feat"].shape[-1] + 3 == self.in_channels
            ) else input_dict["feat"]
        pts = Points(coord, feat, mask)

        in_planes = self.in_channels
        for level in range(5):
            pts = TransitionDown(
                in_planes, PLANES[level], STRIDES[level], NSAMPLES[level],
                name=f"enc{level + 1}_down",
            )(pts, train)
            for i in range(1, self.blocks[level]):
                pts = Bottleneck(
                    PLANES[level], PLANES[level], SHARE_PLANES, NSAMPLES[level],
                    name=f"enc{level + 1}_block{i - 1}",
                )(pts, train)
            in_planes = PLANES[level]

        pooled = masked_mean(pts.feat, pts.mask, axis=1)  # (B, 512)

        y = nn.Dense(256, name="head1")(pooled)
        y = MaskedBatchNorm(256, name="head_bn1")(y, None, train)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = nn.Dense(128, name="head2")(y)
        y = MaskedBatchNorm(128, name="head_bn2")(y, None, train)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return nn.Dense(self.num_classes, name="head3")(y)


@MODELS.register_module("PointTransformer-Cls26")
def point_transformer_cls26(**kwargs):
    return PointTransformerCls(blocks=(1, 1, 1, 1, 1), **kwargs)


@MODELS.register_module("PointTransformer-Cls38")
def point_transformer_cls38(**kwargs):
    return PointTransformerCls(blocks=(1, 2, 2, 2, 2), **kwargs)


@MODELS.register_module("PointTransformer-Cls50")
def point_transformer_cls50(**kwargs):
    return PointTransformerCls(blocks=(1, 2, 3, 5, 2), **kwargs)
