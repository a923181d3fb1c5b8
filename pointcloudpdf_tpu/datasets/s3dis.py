"""S3DIS dataset (reference contract: pointcept/datasets/s3dis.py:22-152).

One ``.pth``/``.npz`` file per room with keys coord/color/semantic_gt/
instance_gt (+ optional normal). Splits are Area_1..Area_6 directories.
"""

from __future__ import annotations

import os

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset, load_scene


@DATASETS.register_module()
class S3DISDataset(DefaultDataset):
    def __init__(
        self,
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root="data/s3dis",
        cache=False,
        **kwargs,
    ):
        self.cache = cache
        self._cache_store = {}
        super().__init__(split=split, data_root=data_root, **kwargs)

    def get_data(self, idx):
        data_path = self.data_list[idx % len(self.data_list)]
        if self.cache and data_path in self._cache_store:
            data = self._cache_store[data_path]
        else:
            data = load_scene(data_path)
            if self.cache:
                self._cache_store[data_path] = data
        coord = data["coord"]
        segment = (
            data["semantic_gt"].reshape(-1)
            if "semantic_gt" in data
            else np.full(coord.shape[0], -1)
        )
        instance = (
            data["instance_gt"].reshape(-1)
            if "instance_gt" in data
            else np.full(coord.shape[0], -1)
        )
        name = os.path.basename(data_path).split("_")[0].replace("R", " r")
        out = dict(
            name=name,
            coord=coord,
            color=data["color"],
            segment=segment,
            instance=instance,
            scene_id=data_path,
        )
        if "normal" in data:
            out["normal"] = data["normal"]
        return out

    def prepare_test_data(self, idx):
        # S3DIS pops segment before the deterministic transform, matching
        # the reference (s3dis.py:118-146)
        data_dict = self.get_data(idx)
        segment = data_dict.pop("segment")
        data_dict = self.transform(data_dict)
        from copy import deepcopy

        fragments = []
        for aug in self.aug_transform:
            aug_data = aug(deepcopy(data_dict))
            parts = (
                self.test_voxelize(aug_data)
                if self.test_voxelize is not None
                else [dict(aug_data, index=np.arange(aug_data["coord"].shape[0]))]
            )
            for part in parts:
                crops = self.test_crop(part) if self.test_crop is not None else [part]
                fragments += crops
        fragments = [self.post_transform(f) for f in fragments]
        return dict(
            fragment_list=fragments, segment=segment, name=self.get_data_name(idx)
        )
