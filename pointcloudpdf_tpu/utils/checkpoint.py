"""Checkpoint save/load: atomic writes, keyword rewrites, partial loads.

Reference semantics (pointcept/engines/hooks/misc.py:148-766): dict
checkpoints {epoch, state, best_metric_value, ...} written atomically via
``.tmp`` + os.replace; loaders support key-prefix rewrites (e.g.
``backbone`` -> ``incr_backbone``) and shape-trimmed partial copies for
open-set finetune / incremental transfer. States are host numpy pytrees.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Optional

import jax
import numpy as np

from .logger import get_root_logger


def to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, payload: Dict) -> None:
    """Atomic checkpoint write (reference misc.py:177-192)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, value in flat.items():
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return tree


def rewrite_keys(flat: Dict[str, np.ndarray], rules: Dict[str, str]
                 ) -> Dict[str, np.ndarray]:
    """Apply substring rewrites to flattened parameter paths.

    Mirrors the reference loaders' ``module.`` normalization and
    backbone->incr_backbone renames (hooks/misc.py:473-482,661-706).
    """
    out = {}
    for path, value in flat.items():
        new_path = path
        for old, new in rules.items():
            new_path = new_path.replace(old, new)
        out[new_path] = value
    return out


def merge_matching(
    target_flat: Dict[str, np.ndarray],
    source_flat: Dict[str, np.ndarray],
    allow_partial_rows: bool = False,
    logger=None,
) -> Dict[str, np.ndarray]:
    """Copy source params into target where paths match.

    Shape-mismatched entries are skipped unless ``allow_partial_rows``,
    which copies the overlapping leading rows (the reference's head
    trim/partial copy for incremental class heads, misc.py:661-706).
    """
    logger = logger or get_root_logger()
    merged = dict(target_flat)
    loaded, skipped = 0, 0
    for path, value in source_flat.items():
        if path not in merged:
            skipped += 1
            continue
        tgt = merged[path]
        if tgt.shape == value.shape:
            merged[path] = value
            loaded += 1
        elif allow_partial_rows and tgt.ndim == value.ndim and tgt.ndim >= 1:
            sliced = np.array(tgt)
            n = min(tgt.shape[-1], value.shape[-1])
            if tgt.ndim == 1:
                sliced[:n] = value[:n]
            else:
                m = min(tgt.shape[0], value.shape[0])
                sliced[:m, ..., :n] = value[:m, ..., :n]
            merged[path] = sliced
            loaded += 1
            logger.info(f"partial load {path}: {value.shape} -> {tgt.shape}")
        else:
            skipped += 1
            logger.warning(f"skip {path}: shape {value.shape} != {tgt.shape}")
    logger.info(f"checkpoint merge: {loaded} loaded, {skipped} skipped")
    return merged


def load_weights_into(
    target_tree: Dict,
    source_tree: Dict,
    rewrite: Optional[Dict[str, str]] = None,
    allow_partial_rows: bool = False,
) -> Dict:
    """Full pipeline: flatten -> rewrite -> merge -> unflatten."""
    target_flat = flatten_tree(target_tree)
    source_flat = flatten_tree(source_tree)
    if rewrite:
        source_flat = rewrite_keys(source_flat, rewrite)
    merged = merge_matching(target_flat, source_flat,
                            allow_partial_rows=allow_partial_rows)
    return unflatten_tree(merged)
