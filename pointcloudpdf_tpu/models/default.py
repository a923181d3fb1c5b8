"""Default model wrappers: segmentor / classifier contracts.

Reference contract (pointcept/models/default.py:39-136): the wrapper owns
the backbone + criteria and returns {loss} (train), {loss, seg_logits}
(eval), {seg_logits} (test). Here the linen module computes logits (+
backbone intermediates, the functional model-hook replacement) and the
pure ``Criteria`` is applied by the engine inside the jit step, keeping
the module stateless.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS, build_model
from .losses import build_criteria
from .norm import MaskedBatchNorm


@MODELS.register_module()
class DefaultSegmentor(nn.Module):
    backbone: Optional[Any] = None
    criteria: Optional[Any] = None

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))

    def __call__(self, input_dict: Dict, train: bool = True) -> Dict:
        if "condition" in input_dict:
            input_dict = dict(input_dict)
            input_dict["condition"] = input_dict["condition"][0]
        out = self.backbone_module(input_dict, train=train)
        if isinstance(out, tuple):
            seg_logits, intermediates = out
        else:
            seg_logits, intermediates = out, {}
        return dict(seg_logits=seg_logits, intermediates=intermediates)

    def loss(self, seg_logits, target):
        # built on demand: usable outside apply() (criteria is pure config)
        return build_criteria(self.criteria)(seg_logits, target)


@MODELS.register_module()
class DefaultSegmentorV2(nn.Module):
    num_classes: int = 0
    backbone_out_channels: int = 0
    backbone: Optional[Any] = None
    criteria: Optional[Any] = None

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        if self.num_classes > 0:
            self.seg_head = nn.Dense(self.num_classes, name="seg_head")

    def __call__(self, input_dict: Dict, train: bool = True) -> Dict:
        out = self.backbone_module(input_dict, train=train)
        if isinstance(out, tuple):
            feat, intermediates = out
        else:
            feat, intermediates = out, {}
        seg_logits = self.seg_head(feat) if self.num_classes > 0 else feat
        return dict(seg_logits=seg_logits, intermediates=intermediates)

    def loss(self, seg_logits, target):
        # built on demand: usable outside apply() (criteria is pure config)
        return build_criteria(self.criteria)(seg_logits, target)


@MODELS.register_module()
class DefaultClassifier(nn.Module):
    backbone: Optional[Any] = None
    criteria: Optional[Any] = None
    num_classes: int = 40
    backbone_embed_dim: int = 256

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))

    def __call__(self, input_dict: Dict, train: bool = True) -> Dict:
        feat = self.backbone_module(input_dict, train=train)
        if isinstance(feat, tuple):
            feat = feat[0]
        if feat.ndim == 3:
            # backbone returned per-point features: masked global pool
            from .utils.structure import masked_mean

            feat = masked_mean(feat, input_dict["mask"], axis=1)
        if feat.shape[-1] != self.num_classes:
            y = nn.Dense(256, name="cls_head1")(feat)
            y = MaskedBatchNorm(256, name="cls_bn1")(y, None, train)
            y = nn.relu(y)
            y = nn.Dropout(0.5, deterministic=not train)(y)
            y = nn.Dense(128, name="cls_head2")(y)
            y = MaskedBatchNorm(128, name="cls_bn2")(y, None, train)
            y = nn.relu(y)
            y = nn.Dropout(0.5, deterministic=not train)(y)
            cls_logits = nn.Dense(self.num_classes, name="cls_head3")(y)
        else:
            cls_logits = feat
        return dict(cls_logits=cls_logits)

    def loss(self, cls_logits, target):
        return build_criteria(self.criteria)(cls_logits, target)
