"""Segmentation / classification losses as pure jnp functions.

Numerical parity with the reference loss zoo
(pointcept/models/losses/misc.py:14-223) on valid entries; every loss
honors ``ignore_index`` so padded points contribute nothing, which is the
static-shape replacement for the reference's boolean indexing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _flatten(pred, target):
    pred = pred.reshape(-1, pred.shape[-1])
    target = target.reshape(-1)
    return pred, target


def masked_mean(values, weights, eps=1e-12):
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), eps)


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        size_average=None,
        reduce=None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = jnp.asarray(weight, jnp.float32) if weight is not None else None
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        pred, target = _flatten(pred, target)
        num_classes = pred.shape[-1]
        valid = (target != self.ignore_index).astype(jnp.float32)
        safe_t = jnp.clip(target, 0, num_classes - 1)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]
        if self.label_smoothing > 0:
            smooth = -jnp.mean(logp, axis=-1)
            nll = (1 - self.label_smoothing) * nll + self.label_smoothing * smooth
        w = valid
        if self.weight is not None:
            w = w * self.weight[safe_t]
        if self.reduction == "sum":
            loss = jnp.sum(nll * w)
        else:  # mean: torch divides by the sum of sample weights
            loss = masked_mean(nll, w)
        return loss * self.loss_weight


@LOSSES.register_module()
class SmoothCELoss:
    def __init__(self, smoothing_ratio: float = 0.1):
        self.smoothing_ratio = smoothing_ratio

    def __call__(self, pred, target):
        pred, target = _flatten(pred, target)
        eps = self.smoothing_ratio
        n_class = pred.shape[1]
        valid = (target >= 0).astype(jnp.float32)
        safe_t = jnp.clip(target, 0, n_class - 1)
        one_hot = jax.nn.one_hot(safe_t, n_class)
        one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=1)
        loss = -jnp.sum(one_hot * logp, axis=1)
        return masked_mean(loss, valid)


@LOSSES.register_module()
class BinaryFocalLoss:
    def __init__(self, gamma=2.0, alpha=0.5, logits=True, reduce=True,
                 loss_weight=1.0):
        assert 0 < alpha < 1
        self.gamma = gamma
        self.alpha = alpha
        self.logits = logits
        self.reduce = reduce
        self.loss_weight = loss_weight

    def __call__(self, pred, target, **kwargs):
        """pred (N,) raw logits or probabilities; target (N,) in [0, 1]."""
        pred = pred.reshape(-1).astype(jnp.float32)
        target = target.reshape(-1).astype(jnp.float32)
        if self.logits:
            p = jax.nn.sigmoid(pred)
            bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
                jnp.exp(-jnp.abs(pred))
            )
        else:
            p = pred
            bce = -(target * jnp.log(jnp.clip(p, 1e-12, 1.0))
                    + (1 - target) * jnp.log(jnp.clip(1 - p, 1e-12, 1.0)))
        pt = jnp.exp(-bce)
        alpha = self.alpha * target + (1 - self.alpha) * (1 - target)
        focal = alpha * (1 - pt) ** self.gamma * bce
        if self.reduce:
            focal = jnp.mean(focal)
        return focal * self.loss_weight


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, gamma=2.0, alpha=0.5, reduction="mean", loss_weight=1.0,
                 ignore_index=-1):
        assert reduction in ("mean", "sum")
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, **kwargs):
        pred, target = _flatten(pred, target)
        pred = pred.astype(jnp.float32)
        num_classes = pred.shape[1]
        valid = (target != self.ignore_index).astype(jnp.float32)[:, None]
        safe_t = jnp.clip(target, 0, num_classes - 1)
        one_hot = jax.nn.one_hot(safe_t, num_classes)
        alpha = self.alpha
        if isinstance(alpha, (list, tuple)):
            alpha = jnp.asarray(alpha)
        p = jax.nn.sigmoid(pred)
        one_minus_pt = (1 - p) * one_hot + p * (1 - one_hot)
        focal_weight = (alpha * one_hot + (1 - alpha) * (1 - one_hot)) * (
            one_minus_pt**self.gamma
        )
        bce = jnp.maximum(pred, 0) - pred * one_hot + jnp.log1p(
            jnp.exp(-jnp.abs(pred))
        )
        loss = bce * focal_weight * valid
        if self.reduction == "mean":
            loss = jnp.sum(loss) / jnp.maximum(jnp.sum(valid) * num_classes, 1e-12)
        else:
            loss = jnp.sum(loss)
        return self.loss_weight * loss


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, smooth=1, exponent=2, loss_weight=1.0, ignore_index=-1):
        self.smooth = smooth
        self.exponent = exponent
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, **kwargs):
        pred, target = _flatten(pred, target)
        num_classes = pred.shape[1]
        valid = (target != self.ignore_index).astype(jnp.float32)[:, None]
        safe_t = jnp.clip(target, 0, num_classes - 1)
        prob = jax.nn.softmax(pred.astype(jnp.float32), axis=1) * valid
        one_hot = jax.nn.one_hot(safe_t, num_classes) * valid
        num = jnp.sum(prob * one_hot, axis=0) * 2 + self.smooth
        den = (
            jnp.sum(prob**self.exponent + one_hot**self.exponent, axis=0)
            + self.smooth
        )
        dice = 1 - num / den
        return self.loss_weight * jnp.mean(dice)
