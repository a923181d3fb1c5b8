"""Optimizers as optax transforms with torch-compatible semantics.

Parity with the reference optimizer builder (pointcept/utils/optimizer.py):
SGD/Adam couple weight decay into the gradient (L2), AdamW decouples it.
Param groups are expressed as path-keyword masks (the reference's
``param_dicts`` keyword matching over named_parameters) implemented with
``optax.multi_transform`` over parameter-path labels.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Union

import jax
import optax

from .logger import get_root_logger
from .registry import Registry

OPTIMIZERS = Registry("optimizers")

ScheduleOrFloat = Union[float, Callable]


def _lr_transform(lr: ScheduleOrFloat, scale: float = 1.0):
    if callable(lr):
        return optax.scale_by_learning_rate(lambda s: lr(s) * scale)
    return optax.scale_by_learning_rate(lr * scale)


@OPTIMIZERS.register_module("SGD")
def sgd(lr: ScheduleOrFloat, momentum: float = 0.0, weight_decay: float = 0.0,
        nesterov: bool = False, lr_scale: float = 1.0, dampening: float = 0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(_lr_transform(lr, lr_scale))
    return optax.chain(*parts)


@OPTIMIZERS.register_module("Adam")
def adam(lr: ScheduleOrFloat, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, lr_scale: float = 1.0):
    parts = []
    if weight_decay:
        # torch Adam couples wd into the gradient before the moments
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(_lr_transform(lr, lr_scale))
    return optax.chain(*parts)


@OPTIMIZERS.register_module("AdamW")
def adamw(lr: ScheduleOrFloat, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.01, lr_scale: float = 1.0):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay),
        _lr_transform(lr, lr_scale),
    )


def _param_path_labels(params, param_dicts) -> "jax.tree_util.PyTreeDef":
    """Label each param by the first matching keyword group (or 'default')."""

    def label(path, _):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        for i, group in enumerate(param_dicts):
            if group["keyword"] in path_str:
                return f"group{i}"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, params=None, param_dicts: Optional[List[dict]] = None,
                    lr_schedule: Optional[Callable] = None):
    """Build an optax transform from a reference-style optimizer config.

    ``lr_schedule`` (step -> lr) overrides the static cfg lr; param groups
    with their own lr are realised as schedule scale factors, matching the
    torch scheduler semantics of scaling each group's base lr.
    """
    cfg = dict(cfg)
    base_lr = cfg.pop("lr")
    opt_type = cfg.pop("type")
    lr: ScheduleOrFloat = lr_schedule if lr_schedule is not None else base_lr

    def make(group_overrides: dict):
        kwargs = dict(cfg)
        kwargs.update({k: v for k, v in group_overrides.items() if k != "keyword"})
        group_lr = kwargs.pop("lr", None)
        scale = (group_lr / base_lr) if group_lr is not None else 1.0
        return OPTIMIZERS.build(dict(type=opt_type, lr=lr, lr_scale=scale, **kwargs))

    if not param_dicts:
        return make({})

    assert params is not None, "params needed for keyword-grouped optimizer"
    labels = _param_path_labels(params, param_dicts)
    transforms = {"default": make({})}
    for i, group in enumerate(param_dicts):
        transforms[f"group{i}"] = make(dict(group))
    get_root_logger().info(
        "optimizer param groups: "
        + ", ".join(f"group{i}<-'{g['keyword']}'" for i, g in enumerate(param_dicts))
    )
    return optax.multi_transform(transforms, labels)
