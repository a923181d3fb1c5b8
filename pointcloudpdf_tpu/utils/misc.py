"""Metric helpers: IoU histograms, AUPR/AUROC, small utilities.

Fresh TPU-first equivalents of the reference metric helpers
(pointcept/utils/misc.py:40-87): the IoU histogram runs on-device via
one-hot segment sums (jit/psum friendly); AUPR/AUROC run on host in numpy
with sklearn-compatible semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# IoU / accuracy histograms
# --------------------------------------------------------------------------

def intersection_and_union(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = -1,
    valid_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class (intersection, union, target) counts; jit-able.

    ``pred``/``target`` are integer arrays of any (matching) shape; padded
    points must either carry ``target == ignore_index`` or be masked out via
    ``valid_mask``. Returns three (num_classes,) float32 arrays so they can
    be ``psum``-reduced across a device mesh.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    if valid_mask is not None:
        valid = valid & valid_mask.reshape(-1)
    # clip to a safe class id; masked entries contribute zero weight
    safe_target = jnp.clip(target, 0, num_classes - 1)
    safe_pred = jnp.clip(pred, 0, num_classes - 1)
    w = valid.astype(jnp.float32)
    target_hist = jnp.zeros(num_classes, jnp.float32).at[safe_target].add(w)
    pred_hist = jnp.zeros(num_classes, jnp.float32).at[safe_pred].add(w)
    inter_w = w * (safe_pred == safe_target).astype(jnp.float32)
    intersection = jnp.zeros(num_classes, jnp.float32).at[safe_target].add(inter_w)
    union = target_hist + pred_hist - intersection
    return intersection, union, target_hist


def intersection_and_union_np(pred, target, num_classes, ignore_index=-1):
    """Numpy twin of :func:`intersection_and_union` for host-side use."""
    pred = np.asarray(pred).reshape(-1).copy()
    target = np.asarray(target).reshape(-1)
    pred[target == ignore_index] = ignore_index
    intersection = pred[pred == target]
    area_inter, _ = np.histogram(intersection, bins=np.arange(num_classes + 1))
    area_pred, _ = np.histogram(pred, bins=np.arange(num_classes + 1))
    area_target, _ = np.histogram(target, bins=np.arange(num_classes + 1))
    area_union = area_pred + area_target - area_inter
    return area_inter.astype(np.float64), area_union.astype(np.float64), area_target.astype(np.float64)


# --------------------------------------------------------------------------
# AUPR / AUROC (sklearn-compatible, numpy implementation)
# --------------------------------------------------------------------------

def _binary_clf_curve(labels: np.ndarray, scores: np.ndarray):
    """Cumulative TP/FP at each distinct descending score threshold."""
    order = np.argsort(-scores, kind="mergesort")
    scores = scores[order]
    labels = labels[order]
    # indices where score changes (thresholds)
    distinct = np.where(np.diff(scores))[0]
    threshold_idxs = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels)[threshold_idxs].astype(np.float64)
    fps = (1 + threshold_idxs) - tps
    return fps, tps


def average_precision(labels, scores) -> float:
    """AUPR as step-wise sum, matching sklearn.average_precision_score."""
    labels = np.asarray(labels).astype(np.int64).reshape(-1)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    n_pos = labels.sum()
    if n_pos == 0:
        return float("nan")
    fps, tps = _binary_clf_curve(labels, scores)
    precision = tps / np.maximum(tps + fps, 1e-12)
    recall = tps / n_pos
    # prepend (recall=0, precision=1) implicitly via diff on recall
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def roc_auc(labels, scores) -> float:
    """AUROC via trapezoid rule, matching sklearn.roc_auc_score."""
    labels = np.asarray(labels).astype(np.int64).reshape(-1)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    n_pos = labels.sum()
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    fps, tps = _binary_clf_curve(labels, scores)
    tpr = np.r_[0.0, tps] / n_pos
    fpr = np.r_[0.0, fps] / n_neg
    return float(np.trapezoid(tpr, fpr))


def aupr_and_auroc(scores, target, unknown_label=1, ignore_index: int = -1):
    """Open-set metrics: score should be high for unknown points.

    ``unknown_label`` is an int or a list of class ids considered unknown
    (reference semantics: pointcept/utils/misc.py:70-87). Returns
    ``(None, None)`` when the batch contains no unknown points, mirroring
    the reference so evaluators can skip the record.
    """
    scores = np.asarray(scores).reshape(-1)
    target = np.asarray(target).reshape(-1)
    valid = target != ignore_index
    scores, target = scores[valid], target[valid]
    labels = np.isin(target, unknown_label).astype(np.int64)
    if labels.sum() == 0:
        return None, None
    return average_precision(labels, scores), roc_auc(labels, scores)


def selected_mask(select, num_classes: int) -> np.ndarray:
    """(num_classes,) bool, True at the selected class ids
    (reference utils/misc.py:184)."""
    mask = np.zeros(num_classes, bool)
    mask[np.asarray(select, dtype=np.int64)] = True
    return mask


# --------------------------------------------------------------------------
# misc
# --------------------------------------------------------------------------

def make_dirs(path: str):
    import os

    os.makedirs(path, exist_ok=True)
    return path
