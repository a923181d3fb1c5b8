"""Point Transformer v1 part-segmentation backbones.

Reference: pointcept/models/point_transformer/point_transformer_partseg.py
— the Seg U-Net with an optional shape-class conditioning in the dec5
global-context head (``num_shape_classes``): the per-sample class token
joins the pooled context before the head MLP.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..utils.structure import Points, masked_mean
from .modules import Bottleneck, TransitionDown, TransitionUp
from .point_transformer_seg import (
    NSAMPLES,
    PLANES,
    SHARE_PLANES,
    STRIDES,
    DecoderStage,
    EncoderStage,
)


class ConditionedHead(nn.Module):
    """dec5 head with shape-class conditioning (reference TransitionUp
    with num_shape_classes, point_transformer_partseg.py:120-168)."""

    in_planes: int
    num_shape_classes: int

    @nn.compact
    def __call__(self, pts: Points, cls_token, train: bool = True):
        coord, x, mask = pts
        ctx = masked_mean(x, mask, axis=1)
        ctx = nn.relu(nn.Dense(self.in_planes, name="linear2")(ctx))
        one_hot = jax.nn.one_hot(cls_token.reshape(-1),
                                 self.num_shape_classes, dtype=x.dtype)
        cls_emb = nn.relu(nn.Dense(self.in_planes, name="linear_cls")(one_hot))
        ctx = jnp.broadcast_to(ctx[:, None, :], x.shape)
        cls_emb = jnp.broadcast_to(cls_emb[:, None, :], x.shape)
        y = jnp.concatenate([x, ctx, cls_emb], axis=-1)
        y = nn.Dense(self.in_planes, name="linear1")(y)
        y = MaskedBatchNorm(self.in_planes, name="bn1")(y, mask, train)
        y = nn.relu(y)
        return jnp.where(mask[..., None], y, 0.0)


class PointTransformerPartSeg(nn.Module):
    """U-shaped PT-v1 for part seg; returns (seg_logits, intermediates)."""

    blocks: Sequence[int]
    in_channels: int = 6
    num_classes: int = 50
    num_shape_classes: Optional[int] = None

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True
                 ) -> Tuple[jnp.ndarray, Dict]:
        pts = Points(
            input_dict["coord"].astype(jnp.float32),
            input_dict["feat"],
            input_dict["mask"],
        )
        inter: Dict = {}
        planes = list(PLANES)
        enc_pts = []
        enc_nbrs = []
        in_planes = self.in_channels
        for level in range(5):
            pts, nbr = EncoderStage(
                in_planes, planes[level], self.blocks[level],
                STRIDES[level], NSAMPLES[level], name=f"enc{level + 1}",
            )(pts, train)
            in_planes = planes[level]
            enc_pts.append(pts)
            enc_nbrs.append(nbr)
            inter[f"enc{level + 1}"] = pts

        # dec5 head: optionally conditioned on the shape class token
        if self.num_shape_classes is not None:
            feat = ConditionedHead(
                planes[4], self.num_shape_classes, name="dec5_head"
            )(enc_pts[4], input_dict["category"], train)
            dec = Points(enc_pts[4].coord, feat, enc_pts[4].mask)
            dec = Bottleneck(
                planes[4], planes[4], SHARE_PLANES, NSAMPLES[4],
                name="dec5_block0",
            )(dec, train, enc_nbrs[4])
        else:
            dec = DecoderStage(
                planes[4], planes[4], 1, NSAMPLES[4], is_head=True,
                name="dec5",
            )(enc_pts[4], None, train, enc_nbrs[4])
        inter["dec5"] = dec
        for level in range(3, -1, -1):
            dec = DecoderStage(
                planes[level + 1], planes[level], 1, NSAMPLES[level],
                name=f"dec{level + 1}",
            )(enc_pts[level], dec, train, enc_nbrs[level])
            inter[f"dec{level + 1}"] = dec

        y = nn.Dense(planes[0], name="cls1")(dec.feat)
        y = MaskedBatchNorm(planes[0], name="cls_bn")(y, dec.mask, train)
        y = nn.relu(y)
        seg_logits = nn.Dense(self.num_classes, name="cls2")(y)
        return seg_logits, inter


@MODELS.register_module("PointTransformer-PartSeg26")
def pt_partseg26(**kwargs):
    return PointTransformerPartSeg(blocks=(1, 1, 1, 1, 1), **kwargs)


@MODELS.register_module("PointTransformer-PartSeg38")
def pt_partseg38(**kwargs):
    return PointTransformerPartSeg(blocks=(1, 2, 2, 2, 2), **kwargs)


@MODELS.register_module("PointTransformer-PartSeg50")
def pt_partseg50(**kwargs):
    return PointTransformerPartSeg(blocks=(1, 2, 3, 5, 2), **kwargs)
