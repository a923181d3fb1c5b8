"""Lovasz-Softmax loss in static-shape jnp.

Semantic parity with the reference LovaszLoss multiclass path
(pointcept/models/losses/lovasz.py:210): ignored entries are given zero
error so they sort to the tail and contribute nothing to the
error-gradient dot product; absent classes are masked out of the mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _lovasz_grad_sorted(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors (1D)."""
    gts = jnp.sum(fg_sorted)
    intersection = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax_flat(probs: jnp.ndarray, labels: jnp.ndarray,
                        valid: jnp.ndarray) -> jnp.ndarray:
    """probs (P, C) softmax outputs, labels (P,) ints, valid (P,) bool."""
    num_classes = probs.shape[1]
    valid_f = valid.astype(jnp.float32)

    def class_loss(c):
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, c]) * valid_f
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad_sorted(fg_sorted)
        present = (jnp.sum(fg) > 0).astype(jnp.float32)
        return jnp.dot(errors_sorted, grad), present

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


@LOSSES.register_module()
class LovaszLoss:
    def __init__(self, mode: str = "multiclass", class_seen=None, per_image=False,
                 ignore_index=-1, loss_weight: float = 1.0):
        assert mode == "multiclass", "only multiclass mode is implemented"
        self.ignore_index = ignore_index
        self.per_image = per_image
        self.class_seen = class_seen
        self.loss_weight = loss_weight

    def __call__(self, pred, target):
        pred = pred.reshape(-1, pred.shape[-1]).astype(jnp.float32)
        target = target.reshape(-1)
        probs = jax.nn.softmax(pred, axis=1)
        if self.class_seen is not None:
            probs = probs[:, : self.class_seen]
        valid = target != self.ignore_index
        safe_t = jnp.clip(target, 0, probs.shape[1] - 1)
        return lovasz_softmax_flat(probs, safe_t, valid) * self.loss_weight
