"""Loss registry + Criteria (reference: pointcept/models/losses/builder.py).

Losses are pure jnp callables configured by registered classes; ``Criteria``
sums a weighted list and is itself a pure function of (pred, target), so it
can live inside a jit-compiled train step.
"""

from ...utils.registry import Registry

LOSSES = Registry("losses")


class Criteria:
    def __init__(self, cfg=None):
        # coerce Mapping entries (e.g. flax FrozenDict module fields) to dict
        self.cfg = [dict(c) for c in (cfg if cfg is not None else [])]
        self.criteria = [LOSSES.build(c) for c in self.cfg]

    def __call__(self, pred, target):
        if len(self.criteria) == 0:
            # loss computed inside the model
            return pred
        loss = 0.0
        for criterion in self.criteria:
            loss = loss + criterion(pred, target)
        return loss


def build_criteria(cfg):
    return Criteria(cfg)
