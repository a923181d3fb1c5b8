"""PointPdf-v1m1: the PDF probability-driven open-set recognizer.

Reference: pointcept/recognizers/ours/pointpdf_v1m1_base.py:28-398.
Split TPU-natively into three parts:

- a flax U-decoder (``self.model``, e.g. PointTransformer-Recognizer) whose
  params live in the trainer's joint TrainState and train jointly with the
  backbone after ``start_epoch`` (the reference's requires_grad toggling
  becomes update masking by the epoch-dependent loss weight);
- pure jit-able score/loss functions (CE over ``[seg_logits ‖ score]`` vs
  the pseudo-labeled segment, softmax K+1 score);
- the host-side pseudo-labeling pipeline (:mod:`.pseudo_label`), fed by a
  jitted device pass producing seg_logits + ball-query neighbor tables.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.builder import build_model
from ..models.losses import build_criteria
from .builder import RECOGNIZER
from .pseudo_label import pseudo_labeling_batch


@RECOGNIZER.register_module("PointPdf-v1m1")
class PointPdfV1:
    has_params = True
    has_pseudo_labeling = True

    def __init__(
        self,
        recognizer,
        criteria,
        loss_weight,
        step_loss_weight: bool,
        num_classes: int,
        start_epoch: int,
        kp_ball_radius: float,
        kp_max_neighbor: int,
        condition_from: str = "msp",
        beta: float = 1.5,
        seed_from: str = "ml",
        seed_range: float = 0.01,
        num_seed: int = 20,
        slide_window: bool = False,
        adaptive_radius: bool = False,
        softmax_score: bool = True,
        use_existing_nn: bool = False,
        pseudo_jobs: int = 4,
    ):
        self.model = build_model(dict(recognizer))  # flax U-decoder
        self.criteria = build_criteria(criteria)
        self.alpha = float(loss_weight)
        self.step_loss_weight = step_loss_weight
        self.num_classes = num_classes
        self.start_epoch = start_epoch
        self.kp_ball_radius = kp_ball_radius
        self.kp_max_neighbor = kp_max_neighbor
        self.condition_from = condition_from
        self.beta = beta
        self.seed_from = seed_from
        self.seed_range = seed_range
        self.num_seed = num_seed
        self.slide_window = slide_window
        self.adaptive_radius = adaptive_radius
        self.softmax_score = softmax_score
        self.pseudo_jobs = pseudo_jobs
        self.epoch = 0

    # -- epoch schedule ------------------------------------------------------
    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def loss_weight(self, epoch: int) -> float:
        """0 before start_epoch (recognizer frozen), then alpha with the
        one-shot x0.1 decay (reference trigger_operation :384-398)."""
        if epoch < self.start_epoch:
            return 0.0
        if self.step_loss_weight and epoch > self.start_epoch + 1:
            return self.alpha * 0.1
        return self.alpha

    def needs_pseudo(self, epoch: int) -> bool:
        return epoch >= self.start_epoch

    # -- jit-able pieces -----------------------------------------------------
    def score(self, seg_logits: jnp.ndarray, rec_raw: jnp.ndarray
              ) -> jnp.ndarray:
        """(B,N,K) logits + (B,N,1) confidence -> (B,N) unknown-ness."""
        if self.softmax_score:
            open_logits = jnp.concatenate([seg_logits, rec_raw], axis=-1)
            return jax.nn.softmax(open_logits, axis=-1)[..., -1]
        return rec_raw[..., 0]

    def rec_loss(self, seg_logits: jnp.ndarray, rec_raw: jnp.ndarray,
                 segment_pseudo: jnp.ndarray) -> jnp.ndarray:
        """CE over K+1 open logits vs pseudo-extended labels (:100-108).
        The caller scales by loss_weight(epoch)."""
        open_logits = jnp.concatenate([seg_logits, rec_raw], axis=-1)
        return self.criteria(open_logits, segment_pseudo)

    def neighbor_radius(self, coord: jnp.ndarray, mask: jnp.ndarray):
        """Static or per-sample adaptive ball radius (:118-137)."""
        if not self.adaptive_radius:
            return self.kp_ball_radius
        big = 1e9
        c_min = jnp.min(jnp.where(mask[..., None], coord, big), axis=1)
        c_max = jnp.max(jnp.where(mask[..., None], coord, -big), axis=1)
        return jnp.min((c_max - c_min + 1e-6) / 16.0, axis=-1)  # (B,)

    def pseudo_scores(self, seg_logits: jnp.ndarray, mask: jnp.ndarray):
        """(B,N,K) logits -> ((B,N) msp, (B,N) per-sample-normalized max
        logit) — the ONLY per-point values the host graph stage consumes
        (reference pointpdf_v1m1_base.py:211-218).  Computing them on
        device shrinks the host fetch from (N, K) logits to 2 floats per
        point; min/max are masked per sample like the reference's
        per-scene normalization."""
        msp = jnp.max(jax.nn.softmax(seg_logits, axis=-1), axis=-1)
        ml = jnp.max(seg_logits, axis=-1)
        big = jnp.float32(1e30)
        ml_min = jnp.min(jnp.where(mask, ml, big), axis=1, keepdims=True)
        ml_max = jnp.max(jnp.where(mask, ml, -big), axis=1, keepdims=True)
        ml = (ml - ml_min) / (ml_max - ml_min + 1e-6)
        return msp, ml

    # -- host pseudo-labeling ------------------------------------------------
    def pseudo_masks(
        self,
        coord: np.ndarray,
        seg_logits: np.ndarray,
        neighbors: np.ndarray,
        count: np.ndarray,
        seed: int = 0,
    ) -> np.ndarray:
        return pseudo_labeling_batch(
            coord, seg_logits, neighbors, count,
            seed=seed,
            n_jobs=self.pseudo_jobs,
            condition_from=self.condition_from,
            beta=self.beta,
            seed_from=self.seed_from,
            seed_range=self.seed_range,
            num_seed=self.num_seed,
            slide_window=self.slide_window,
        )

    def pseudo_masks_from_scores(
        self,
        coord: np.ndarray,       # (B, N, 3) host copy (no fetch needed)
        msp: np.ndarray,         # (B, N) device-computed
        ml: np.ndarray,          # (B, N) device-computed, normalized
        count: np.ndarray,
        seed: int = 0,
        neighbors: np.ndarray = None,
        ball_radius: float = None,
    ) -> np.ndarray:
        """Scores-only variant: the neighbor table is built host-side
        (scipy cKDTree) from the coords the trainer already holds, so the
        device->host payload is just the two (B, N) score sheets."""
        return pseudo_labeling_batch(
            coord, None, neighbors, count,
            seed=seed,
            n_jobs=self.pseudo_jobs,
            scores=(msp, ml),
            ball_radius=(self.kp_ball_radius if ball_radius is None
                         else ball_radius),
            ball_k=self.kp_max_neighbor,
            condition_from=self.condition_from,
            beta=self.beta,
            seed_from=self.seed_from,
            seed_range=self.seed_range,
            num_seed=self.num_seed,
            slide_window=self.slide_window,
        )
