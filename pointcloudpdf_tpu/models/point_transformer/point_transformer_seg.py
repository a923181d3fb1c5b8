"""Point Transformer v1 segmentation backbones.

TPU-native re-design of the reference PT-v1 U-Net
(pointcept/models/point_transformer/point_transformer_seg.py:195-327):
five encoder stages (stride 1,4,4,4,4) and five decoder stages over padded
batches. The backbone also returns an ``intermediates`` dict of per-stage
Points — the functional replacement for the reference's forward hooks
(models/utils/model_hook.py) consumed by the open-set recognizers.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..utils.structure import Points
from .modules import Bottleneck, TransitionDown, TransitionUp

PLANES = (32, 64, 128, 256, 512)
STRIDES = (1, 4, 4, 4, 4)
NSAMPLES = (8, 16, 16, 16, 16)
SHARE_PLANES = 8


class EncoderStage(nn.Module):
    in_planes: int
    planes: int
    blocks: int
    stride: int
    nsample: int
    dtype: Any = jnp.float32
    fps_group_steps: int = 64

    @nn.compact
    def __call__(self, pts: Points, train: bool = True):
        import jax

        from ...ops.geometry import knn

        pts = TransitionDown(
            self.in_planes, self.planes, self.stride, self.nsample,
            fps_group_steps=self.fps_group_steps,
            dtype=self.dtype, name="down"
        )(pts, train)
        # one kNN table per stage: coords are fixed after the down step
        idx, dist2 = jax.vmap(
            lambda q, r, m: knn(q, r, self.nsample, ref_mask=m)
        )(pts.coord, pts.coord, pts.mask)
        nbr = (idx, jnp.isfinite(dist2) & pts.mask[..., None])
        for i in range(self.blocks):
            pts = Bottleneck(
                self.planes, self.planes, SHARE_PLANES, self.nsample,
                dtype=self.dtype, name=f"block{i}",
            )(pts, train, nbr)
        # the table is also the decoder-stage table at this level (same
        # coords, same mask, same k) — return it so the decoder need not
        # recompute it (the dec1 self-kNN alone is ~20 ms at 4x32768)
        return pts, nbr


class DecoderStage(nn.Module):
    in_planes: int
    planes: int
    blocks: int
    nsample: int
    is_head: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: Points, coarse=None, train: bool = True,
                 nbr=None) -> Points:
        import jax

        from ...ops.geometry import knn

        feat = TransitionUp(
            self.in_planes, None if self.is_head else self.planes,
            dtype=self.dtype, name="up"
        )(pts, coarse, train)
        pts = Points(pts.coord, feat, pts.mask)
        if nbr is None:
            idx, dist2 = jax.vmap(
                lambda q, r, m: knn(q, r, self.nsample, ref_mask=m)
            )(pts.coord, pts.coord, pts.mask)
            nbr = (idx, jnp.isfinite(dist2) & pts.mask[..., None])
        for i in range(self.blocks):
            pts = Bottleneck(
                self.planes, self.planes, SHARE_PLANES, self.nsample,
                dtype=self.dtype, name=f"block{i}",
            )(pts, train, nbr)
        return pts


class PointTransformerSeg(nn.Module):
    """U-shaped PT-v1; returns (seg_logits (B,N,num_classes), intermediates).

    ``amp=True`` runs the feature path in bfloat16 (params, BN statistics,
    attention softmax, and the logits head stay float32) — the elementwise
    HBM traffic that dominates the eval-mode network halves; coordinates
    and kNN geometry are untouched.  Mirrors the reference's AMP autocast
    (its configs train PT-v1 under fp16 AMP)."""

    blocks: Sequence[int]
    in_channels: int = 6
    num_classes: int = 13
    amp: bool = False
    # blocked-FPS group size; a value >= N/4 forces exact sequential FPS
    # (the reference kernel's semantics) — used by the golden parity test
    fps_group_steps: int = 64

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, Points]]:
        dtype = jnp.bfloat16 if self.amp else jnp.float32
        pts = Points(
            input_dict["coord"].astype(jnp.float32),
            input_dict["feat"].astype(dtype),
            input_dict["mask"],
        )
        inter: Dict[str, Points] = {}

        planes = list(PLANES)
        enc_pts = []
        enc_nbrs = []
        in_planes = self.in_channels
        for level in range(5):
            pts, nbr = EncoderStage(
                in_planes, planes[level], self.blocks[level],
                STRIDES[level], NSAMPLES[level], dtype=dtype,
                fps_group_steps=self.fps_group_steps,
                name=f"enc{level + 1}",
            )(pts, train)
            in_planes = planes[level]
            enc_pts.append(pts)
            enc_nbrs.append(nbr)
            inter[f"enc{level + 1}"] = pts

        # decoder: dec5 is the global-context head, dec4..dec1 fuse skips;
        # each stage reuses its encoder level's kNN table (same coords/mask/k)
        dec = DecoderStage(
            planes[4], planes[4], 1, NSAMPLES[4], is_head=True, dtype=dtype,
            name="dec5"
        )(enc_pts[4], None, train, enc_nbrs[4])
        inter["dec5"] = dec
        for level in range(3, -1, -1):
            dec = DecoderStage(
                planes[level + 1], planes[level], 1, NSAMPLES[level],
                dtype=dtype, name=f"dec{level + 1}",
            )(enc_pts[level], dec, train, enc_nbrs[level])
            inter[f"dec{level + 1}"] = dec

        y = nn.Dense(planes[0], name="cls1",
                     dtype=dtype)(dec.feat)
        y = MaskedBatchNorm(planes[0], name="cls_bn")(y, dec.mask, train)
        y = nn.relu(y)
        # logits head back in f32: CE/softmax downstream needs the range
        seg_logits = nn.Dense(self.num_classes, name="cls2")(
            y.astype(jnp.float32))
        return seg_logits, inter


# linen modules are frozen dataclasses, so depth variants register as
# factory functions rather than subclasses
@MODELS.register_module("PointTransformer-Seg26")
def point_transformer_seg26(**kwargs):
    return PointTransformerSeg(blocks=(1, 1, 1, 1, 1), **kwargs)


@MODELS.register_module("PointTransformer-Seg38")
def point_transformer_seg38(**kwargs):
    return PointTransformerSeg(blocks=(1, 2, 2, 2, 2), **kwargs)


@MODELS.register_module("PointTransformer-Seg50")
def point_transformer_seg50(**kwargs):
    return PointTransformerSeg(blocks=(1, 2, 3, 5, 2), **kwargs)
