"""MSP / MaxLogit open-set baselines.

Reference: pointcept/recognizers/max_probability/max_probability_v1m1_base.py:8-32
— score = -max log-softmax (msp) or -max logit (ml) of the backbone
seg_logits. Stateless: the score function runs inside the trainer's jit
step, so there is no module, no params, and no extra forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import RECOGNIZER


@RECOGNIZER.register_module()
class MaxProbability:
    """Plain-object recognizer; higher score = more likely unknown."""

    # protocol flags consumed by OpenSegTrainer
    has_params = False
    has_pseudo_labeling = False
    softmax_score = False

    def __init__(self, method="msp"):
        if method not in ("msp", "max_logits", "ml"):
            raise ValueError(f"Unknown MaxProbability method {method}")
        self.method = method
        self.epoch = 0

    def score(self, seg_logits: jnp.ndarray, rec_raw=None) -> jnp.ndarray:
        """jit-able: (..., K) logits -> (...,) unknown-ness score."""
        if self.method == "msp":
            return -jnp.max(jax.nn.log_softmax(seg_logits), axis=-1)
        return -jnp.max(seg_logits, axis=-1)

    def loss_weight(self, epoch: int) -> float:
        return 0.0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
