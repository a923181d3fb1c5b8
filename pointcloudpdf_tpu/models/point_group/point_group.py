"""PointGroup instance segmentation (bottom-up centroid-shift grouping).

Reference: pointcept/models/point_group/point_group_v1m1_base.py:23-200.
The device computes semantic logits + per-point centroid-shift vectors
(one jit step, losses inside); the eval-time grouping of shifted points
(the pointgroup_ops BFS CUDA kernels) moves to the host radius-graph
connected components in :mod:`...ops.cluster`, driven by the
InsSegEvaluator.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import MODELS, build_model
from ..norm import MaskedBatchNorm


@MODELS.register_module("PG-v1m1")
class PointGroup(nn.Module):
    backbone: Optional[Any] = None
    backbone_out_channels: int = 64
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Sequence[int] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    cluster_closed_points: int = 300
    cluster_propose_points: int = 100
    cluster_min_points: int = 50
    voxel_size: float = 0.02

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.bias_fc1 = nn.Dense(self.backbone_out_channels, name="bias_fc1")
        self.bias_bn = MaskedBatchNorm(
            self.backbone_out_channels, momentum=0.01, epsilon=1e-3,
            name="bias_bn",
        )
        self.bias_fc2 = nn.Dense(3, name="bias_fc2")
        self.seg_head = nn.Dense(self.semantic_num_classes, name="seg_head")

    def __call__(self, input_dict: Dict, train: bool = True) -> Dict:
        out = self.backbone_module(input_dict, train=train)
        feat = out[0] if isinstance(out, tuple) else out
        mask = input_dict["mask"]

        y = self.bias_fc1(feat)
        y = self.bias_bn(y, mask, train)
        y = nn.relu(y)
        bias_pred = self.bias_fc2(y)
        seg_logits = self.seg_head(feat)

        result = dict(
            seg_logits=jnp.where(mask[..., None], seg_logits, 0.0),
            bias_pred=jnp.where(mask[..., None], bias_pred, 0.0),
        )
        if "instance_centroid" in input_dict:
            result.update(self.loss(input_dict, result))
        return result

    def loss(self, input_dict: Dict, out: Dict) -> Dict:
        """Semantic CE + masked centroid-shift L1 + direction cosine
        (reference :71-89)."""
        coord = input_dict["coord"]
        segment = input_dict["segment"]
        instance = input_dict["instance"]
        centroid = input_dict["instance_centroid"]
        mask = input_dict["mask"]
        seg_logits, bias_pred = out["seg_logits"], out["bias_pred"]

        # semantic CE over valid, non-ignored points
        valid = (segment != self.semantic_ignore_index) & mask
        logp = jnp.take_along_axis(
            jnp.log(jnp.clip(jnp.exp(
                seg_logits - seg_logits.max(-1, keepdims=True)
            ) / jnp.sum(jnp.exp(
                seg_logits - seg_logits.max(-1, keepdims=True)
            ), axis=-1, keepdims=True), 1e-12, 1.0)),
            jnp.clip(segment, 0, self.semantic_num_classes - 1)[..., None],
            axis=-1,
        )[..., 0]
        w = valid.astype(jnp.float32)
        seg_loss = -jnp.sum(logp * w) / jnp.maximum(w.sum(), 1.0)

        inst_mask = ((instance != self.instance_ignore_index) & mask).astype(
            jnp.float32
        )
        bias_gt = centroid - coord
        l1 = jnp.sum(jnp.abs(bias_pred - bias_gt), axis=-1)
        bias_l1_loss = jnp.sum(l1 * inst_mask) / jnp.maximum(
            inst_mask.sum(), 1e-8
        )
        pn = bias_pred / (jnp.linalg.norm(bias_pred, axis=-1, keepdims=True)
                          + 1e-8)
        gn = bias_gt / (jnp.linalg.norm(bias_gt, axis=-1, keepdims=True)
                        + 1e-8)
        cos = -jnp.sum(pn * gn, axis=-1)
        bias_cosine_loss = jnp.sum(cos * inst_mask) / jnp.maximum(
            inst_mask.sum(), 1e-8
        )
        loss = seg_loss + bias_l1_loss + bias_cosine_loss
        return dict(loss=loss, seg_loss=seg_loss, bias_l1_loss=bias_l1_loss,
                    bias_cosine_loss=bias_cosine_loss)

    def propose(self, coord, seg_logits, bias_pred, mask):
        """Host-side proposal generation (numpy in, numpy out)."""
        import numpy as np

        from ...ops.cluster import bfs_cluster

        probs = np.exp(seg_logits - seg_logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        segment_pred = probs.argmax(-1)
        keep = mask & ~np.isin(segment_pred, list(self.segment_ignore_index))
        idx = np.where(keep)[0]
        if idx.size == 0:
            return (np.zeros((0, len(coord)), bool), np.zeros(0, np.int64),
                    np.zeros(0, np.float32))
        center = (coord[idx] + bias_pred[idx]) / self.voxel_size
        clusters = bfs_cluster(
            center, segment_pred[idx], self.cluster_thresh,
            self.cluster_closed_points, self.cluster_min_points,
        )
        masks, classes, scores = [], [], []
        for members in clusters:
            rows = idx[members]
            if len(rows) <= self.cluster_propose_points:
                continue
            m = np.zeros(len(coord), bool)
            m[rows] = True
            cls = segment_pred[rows[0]]
            masks.append(m)
            classes.append(cls)
            scores.append(float(probs[rows, cls].mean()))
        if not masks:
            return (np.zeros((0, len(coord)), bool), np.zeros(0, np.int64),
                    np.zeros(0, np.float32))
        return (np.stack(masks), np.asarray(classes, np.int64),
                np.asarray(scores, np.float32))
