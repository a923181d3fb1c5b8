"""Point Prompt Training (PPT): language-guided multi-dataset learning.

Reference: pointcept/models/point_prompt_training/
point_prompt_training_v1m1_language_guided.py:18-120 — a shared backbone
conditioned per dataset (context embedding + PDNorm) with a frozen CLIP
text embedding of the union class vocabulary as the classifier.

Zero-egress TPU adaptation: CLIP weights cannot be downloaded, so the
class embedding table is (a) loaded from ``class_embedding_path`` (an
``.npy`` of precomputed CLIP text features, same semantics as the
reference) when given, else (b) a trainable truncated-normal table —
language *initialisation* is lost but the per-dataset masked cosine
classifier structure is identical.  The dataset ``condition`` is a
static call argument: one compiled executable per dataset, selected by
the MultiDatasetTrainer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import MODELS, build_model
from ..losses import build_criteria

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)

DEFAULT_CLASS_NAMES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "bookcase", "picture", "counter", "desk",
    "shelves", "curtain", "dresser", "pillow", "mirror", "ceiling",
    "refrigerator", "television", "shower curtain", "nightstand", "toilet",
    "sink", "lamp", "bathtub", "garbagebin", "board", "beam", "column",
    "clutter", "otherstructure", "otherfurniture", "otherprop",
)
DEFAULT_VALID_INDEX = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23,
     25, 26, 33, 34, 35),
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 15, 20, 22, 24, 25, 27, 34),
    (0, 1, 4, 5, 6, 7, 8, 10, 19, 29, 30, 31, 32),
)


@MODELS.register_module("PPT-v1m1")
class PointPromptTraining(nn.Module):
    backbone: Optional[Any] = None
    criteria: Optional[Any] = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    template: str = "[x]"
    clip_model: str = "ViT-B/16"
    class_name: Sequence[str] = DEFAULT_CLASS_NAMES
    valid_index: Sequence[Sequence[int]] = DEFAULT_VALID_INDEX
    backbone_mode: bool = False
    class_embedding_path: Optional[str] = None
    embed_channels: int = 512

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.embedding_table = nn.Embed(
            len(self.conditions), self.context_channels,
            name="embedding_table",
        )
        if not self.backbone_mode:
            if self.class_embedding_path:
                table = np.load(self.class_embedding_path).astype(np.float32)
                table = table / np.linalg.norm(table, axis=-1, keepdims=True)
                init = lambda key, shape: jnp.asarray(table)
                shape = table.shape
            else:
                init = _trunc02
                shape = (len(self.class_name), self.embed_channels)
            self.class_embedding = self.param("class_embedding", init, shape)
            self.proj_head = nn.Dense(shape[-1], name="proj_head")
            self.logit_scale = self.param(
                "logit_scale",
                lambda key, s: jnp.full(s, math.log(1 / 0.07)), (),
            )

    def __call__(self, input_dict: Dict, train: bool = True,
                 condition: Optional[str] = None) -> Dict:
        condition = condition or input_dict.get("condition_name")
        assert condition in self.conditions, condition
        ci = self.conditions.index(condition)
        context = self.embedding_table(jnp.asarray([ci]))

        data = dict(input_dict)
        data["context"] = context
        out = self._backbone_forward(data, train, condition)
        feat = out[0] if isinstance(out, tuple) else out
        if self.backbone_mode:
            return feat
        feat = self.proj_head(feat)
        feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-8)
        emb = self.class_embedding
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        sel = jnp.asarray(self.valid_index[ci])
        sim = jnp.einsum("...nc,kc->...nk", feat, emb[sel])
        seg_logits = jnp.exp(self.logit_scale) * sim
        result = dict(seg_logits=seg_logits)
        if "segment" in input_dict:
            criteria = build_criteria(self.criteria)
            result["loss"] = criteria(seg_logits, input_dict["segment"])
        return result

    def _backbone_forward(self, data, train, condition):
        """Pass condition through to PDNorm-aware backbones (capability
        decided by signature inspection, not by swallowing TypeError)."""
        import inspect

        takes = "condition" in inspect.signature(
            type(self.backbone_module).__call__
        ).parameters
        if takes:
            return self.backbone_module(data, train=train, condition=condition)
        return self.backbone_module(data, train=train)


@MODELS.register_module("PPT-v1m2")
class PointPromptTrainingV2(nn.Module):
    """PPT with a decoupled per-dataset segmentation head.

    Reference: point_prompt_training_v1m2_decoupled.py:18-81 — instead of
    the shared language-guided classifier, each dataset condition owns a
    plain Dense head over the PDNorm-conditioned backbone features.  The
    condition is a static call argument (one executable per dataset).
    """

    backbone: Optional[Any] = None
    criteria: Optional[Any] = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    num_classes: Sequence[int] = (25, 20, 13)
    backbone_mode: bool = False

    def setup(self):
        assert len(self.conditions) == len(self.num_classes)
        self.backbone_module = build_model(dict(self.backbone))
        self.embedding_table = nn.Embed(
            len(self.conditions), self.context_channels,
            name="embedding_table",
        )
        self.seg_heads = [
            nn.Dense(ncls, name=f"seg_head_{i}")
            for i, ncls in enumerate(self.num_classes)
        ]

    def __call__(self, input_dict: Dict, train: bool = True,
                 condition: Optional[str] = None) -> Dict:
        condition = condition or input_dict.get("condition_name")
        assert condition in self.conditions, condition
        ci = list(self.conditions).index(condition)
        context = self.embedding_table(jnp.asarray([ci]))

        data = dict(input_dict)
        data["context"] = context
        import inspect

        takes = "condition" in inspect.signature(
            type(self.backbone_module).__call__
        ).parameters
        if takes:
            out = self.backbone_module(data, train=train, condition=condition)
        else:
            out = self.backbone_module(data, train=train)
        feat = out[0] if isinstance(out, tuple) else out
        if self.backbone_mode:
            return feat
        # all heads must be created for a condition-independent param tree;
        # only the active one contributes to the output
        logits = [head(feat) for head in self.seg_heads]
        seg_logits = logits[ci]
        result = dict(seg_logits=seg_logits)
        if "segment" in input_dict:
            criteria = build_criteria(self.criteria)
            result["loss"] = criteria(seg_logits, input_dict["segment"])
        return result
