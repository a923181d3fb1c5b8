"""ARKitScenes dataset (label-free; used for pretraining/inference).

Reference: pointcept/datasets/arkitscenes.py — mesh-derived scenes under
``<root>/<split>`` (Training/Validation), coord/color/normal without
semantic labels.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset, load_scene


@DATASETS.register_module()
class ArkitScenesDataset(DefaultDataset):
    def __init__(self, split="Training", **kwargs):
        kwargs.setdefault("data_root", "data/arkitscenes")
        super().__init__(split=split, **kwargs)

    def get_data(self, idx):
        data = self._cached_scene(idx % len(self.data_list))
        coord = data["coord"]
        out = dict(
            coord=coord,
            segment=np.full(coord.shape[0], -1, np.int64),
        )
        for key in ("color", "normal"):
            if key in data:
                out[key] = data[key]
        return out
