"""Context-Aware Classifier segmentor (CAC).

Reference: pointcept/models/context_aware_classifier/
context_aware_classifier_v1m1_base.py:15-270.  A cosine prototype
classifier over backbone features with two context branches:

- *post refinement*: per-sample soft class prototypes (softmax-weighted
  feature means) concatenated with the learned prototypes and projected,
  re-scoring features — the reference's per-offset loop becomes a vmap
  over the padded batch;
- *adaptive perspective* (train only): ground-truth class means replace
  the learned prototypes where a class is present in the batch;
- a class-balanced entropy-weighted distillation between the branches.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import MODELS, build_model
from ..losses import build_criteria
from ..norm import MaskedBatchNorm


def _l2norm(x, axis=-1):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-8)


@MODELS.register_module("CAC-v1m1")
class CACSegmentor(nn.Module):
    num_classes: int
    backbone_out_channels: int
    backbone: Optional[Any] = None
    criteria: Optional[Any] = None
    cos_temp: float = 15.0
    main_weight: float = 1.0
    pre_weight: float = 1.0
    pre_self_weight: float = 1.0
    kl_weight: float = 1.0
    conf_thresh: float = 0.0
    detach_pre_logits: bool = False

    def setup(self):
        c = self.backbone_out_channels
        self.backbone_module = build_model(dict(self.backbone))
        # the seg head weight doubles as the class prototypes (reference
        # uses seg_head.weight in both roles), so keep it an explicit param
        self.proto = self.param(
            "proto", nn.initializers.lecun_normal(),
            (self.num_classes, self.backbone_out_channels),
        )
        self.seg_bias = self.param(
            "seg_bias", nn.initializers.zeros, (self.num_classes,)
        )
        self.proj1 = nn.Dense(2 * c, use_bias=False, name="proj1")
        self.proj2 = nn.Dense(c, name="proj2")
        self.apd_proj1 = nn.Dense(2 * c, use_bias=False, name="apd_proj1")
        self.apd_proj2 = nn.Dense(c, name="apd_proj2")
        self.feat_fc1 = nn.Dense(c, use_bias=False, name="feat_fc1")
        self.feat_bn = MaskedBatchNorm(c, name="feat_bn")
        self.feat_fc2 = nn.Dense(c, name="feat_fc2")

    def _proj(self, x):
        return self.proj2(nn.relu(self.proj1(x)))

    def _apd_proj(self, x):
        return self.apd_proj2(nn.relu(self.apd_proj1(x)))

    def _feat_proj(self, x, mask, train):
        y = self.feat_fc1(x)
        y = self.feat_bn(y, mask, train)
        return self.feat_fc2(nn.relu(y))

    @staticmethod
    def _cosine_pred(x, proto):
        return jnp.einsum("...nc,kc->...nk", _l2norm(x), _l2norm(proto))

    def _refine(self, feat, pred, proto, mask, train):
        """Per-sample soft-prototype refinement (reference :103-149)."""
        if self.detach_pre_logits:
            pred = jax.lax.stop_gradient(pred)

        def one(f, p, m):
            w = jax.nn.softmax(p, axis=-1).T           # (cls, n)
            w = w * m[None, :]
            if self.conf_thresh > 0:
                keep = (w.max(0) >= self.conf_thresh).astype(w.dtype)
                w = w * keep[None, :]
            w = w / (w.sum(-1, keepdims=True) + 1e-7)
            return w @ f                                 # (cls, c)

        pred_proto = jax.vmap(one)(feat, pred, mask.astype(feat.dtype))
        proto_b = jnp.broadcast_to(
            proto[None], (feat.shape[0],) + proto.shape
        )
        pred_proto = self._proj(
            jnp.concatenate([pred_proto, proto_b], axis=-1)
        )
        x = self._feat_proj(feat, mask, train)
        return jnp.einsum(
            "bnc,bkc->bnk", _l2norm(x), _l2norm(pred_proto)
        )

    def _adaptive(self, feat, target, proto, mask, train):
        """GT-class means replace prototypes where present
        (reference :73-101); computed over the whole batch."""
        c = feat.shape[-1]
        flat = feat.reshape(-1, c)
        tgt = target.reshape(-1)
        m = (mask.reshape(-1) & (tgt != -1)).astype(flat.dtype)
        safe = jnp.clip(tgt, 0, self.num_classes - 1)
        sums = jnp.zeros((self.num_classes, c), flat.dtype).at[safe].add(
            flat * m[:, None]
        )
        counts = jnp.zeros((self.num_classes,), flat.dtype).at[safe].add(m)
        present = (counts > 0)[:, None]
        class_mean = sums / jnp.maximum(counts[:, None], 1e-4)
        base = jax.lax.stop_gradient(proto)
        new_proto = jnp.where(present, class_mean, base)
        new_proto = self._apd_proj(
            jnp.concatenate([new_proto, proto], axis=-1)
        )
        x = self._feat_proj(feat, mask, train)
        return self._cosine_pred(x, new_proto)

    def _distill_loss(self, pred, soft, target, mask, smoothness=0.5):
        """Class-balanced entropy-weighted KD (reference :152-200)."""
        soft = jax.lax.stop_gradient(soft)
        k = pred.shape[-1]
        sm = jax.nn.softmax(soft, axis=-1)
        valid = mask & (target != -1)
        onehot = jax.nn.one_hot(jnp.clip(target, 0, k - 1), k,
                                dtype=pred.dtype)
        onehot = onehot * valid[..., None]
        smoothed = smoothness * sm + (1 - smoothness) * onehot
        loss = -jnp.sum(jax.nn.log_softmax(pred, axis=-1) * smoothed, -1)
        entropy = -jnp.sum(sm * jnp.log(sm + 1e-4), axis=-1)
        entropy = entropy * valid.astype(entropy.dtype)

        # class-balanced: mean over classes of entropy-weighted means
        flat_t = jnp.clip(target.reshape(-1), 0, k - 1)
        flat_l = loss.reshape(-1)
        flat_e = entropy.reshape(-1) * valid.reshape(-1)
        num = jnp.zeros((k,), flat_l.dtype).at[flat_t].add(flat_l * flat_e)
        den = jnp.zeros((k,), flat_l.dtype).at[flat_t].add(flat_e)
        has = den > 1e-4
        per_class = jnp.where(has, num / jnp.maximum(den, 1e-4), 0.0)
        return jnp.sum(per_class) / jnp.maximum(jnp.sum(has), 1e-4)

    def __call__(self, input_dict: Dict, train: bool = True) -> Dict:
        mask = input_dict["mask"]
        out = self.backbone_module(input_dict, train=train)
        feat = out[0] if isinstance(out, tuple) else out
        proto = self.proto                                   # (cls, c)
        seg_logits = jnp.einsum("...nc,kc->...nk", feat, proto) + self.seg_bias

        refine = self._refine(feat, seg_logits, proto, mask, train
                              ) * self.cos_temp
        result = dict(seg_logits=jnp.where(mask[..., None], refine, 0.0))

        if train and "segment" in input_dict:
            target = input_dict["segment"]
            criteria = build_criteria(self.criteria)
            cac_pred = self._adaptive(feat, target, proto, mask, train
                                      ) * self.cos_temp
            seg_loss = criteria(refine, target) * self.main_weight
            pre_loss = criteria(cac_pred, target) * self.pre_weight
            pre_self_loss = criteria(seg_logits, target) * self.pre_self_weight
            kl_loss = self._distill_loss(
                refine, cac_pred, target, mask
            ) * self.kl_weight
            result.update(
                loss=seg_loss + pre_loss + pre_self_loss + kl_loss,
                seg_loss=seg_loss, pre_loss=pre_loss,
                pre_self_loss=pre_self_loss, kl_loss=kl_loss,
            )
        return result

    def loss(self, seg_logits, target):
        return build_criteria(self.criteria)(seg_logits, target)
