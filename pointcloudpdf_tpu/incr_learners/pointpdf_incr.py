"""Incremental learner: distill an open-set teacher into an extended student.

Reference: pointcept/incrLearners/ours/pointpdf_incr_v1m1_base.py:13-87.
The student (``incr_backbone``) has base+new class logits; the frozen
teacher provides soft targets.  TPU-natively the learner is a plain object
holding the student flax module plus pure loss functions; the trainer owns
the teacher variables and passes both through one jitted step (the
reference's no-grad teacher forward becomes ``stop_gradient``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.builder import build_model
from ..models.losses import build_criteria
from .builder import INCREMENTALLEARNER


def incr_distill_kl_loss(
    pred: jnp.ndarray,        # (B, N, K_new) student logits
    target: jnp.ndarray,      # (B, N, K_base) teacher logits (no grad)
    segment_incr: jnp.ndarray,  # (B, N) new-class labels, -1 elsewhere
    mask: jnp.ndarray,        # (B, N) valid points
    pred_temp: float = 1.0,
    target_temp: float = 1.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """KL(student ‖ [softmax(teacher) zero-padded; one-hot at labeled
    incr points]), mean over valid points (reference IncrDistillKlLoss
    :62-87; torch's reduction="batchmean" over packed points becomes a
    masked mean over padded slots)."""
    k_new = pred.shape[-1]
    k_base = target.shape[-1]
    log_p = jax.nn.log_softmax(pred / pred_temp, axis=-1)
    soft = jax.nn.softmax(target / target_temp, axis=-1)
    soft = jnp.pad(soft, ((0, 0), (0, 0), (0, k_new - k_base)))
    labeled = segment_incr != -1
    one_hot = jax.nn.one_hot(jnp.clip(segment_incr, 0, k_new - 1), k_new,
                             dtype=soft.dtype)
    q = jnp.where(labeled[..., None], one_hot, soft)
    # pointwise KL(q ‖ p) = sum q (log q - log p); q log q with 0*log0 = 0
    log_q = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-30)), 0.0)
    kl = jnp.sum(q * (log_q - log_p), axis=-1)
    valid = mask.astype(kl.dtype)
    return loss_weight * jnp.sum(kl * valid) / jnp.maximum(valid.sum(), 1.0)


@INCREMENTALLEARNER.register_module("PointPdf-incr-v1m1")
class PointPdfIncrV1:
    need_teacher_model = True

    def __init__(self, backbone=None, eval_criteria=None,
                 pred_temp: float = 1.0, target_temp: float = 1.0,
                 loss_weight: float = 1.0):
        self.model = build_model(dict(backbone))  # student flax backbone
        self.eval_criteria = build_criteria(eval_criteria)
        self.pred_temp = pred_temp
        self.target_temp = target_temp
        self.loss_weight = loss_weight

    def distill_loss(self, student_logits, teacher_logits, segment_incr, mask):
        return incr_distill_kl_loss(
            student_logits,
            jax.lax.stop_gradient(teacher_logits),
            segment_incr,
            mask,
            self.pred_temp,
            self.target_temp,
            self.loss_weight,
        )

    def eval_loss(self, student_logits, segment_incr_remap):
        return self.eval_criteria(student_logits, segment_incr_remap)
