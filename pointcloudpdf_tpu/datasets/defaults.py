"""Base datasets: file-per-scene loading plus train/test preparation.

Fresh implementation of the reference dataset contract
(pointcept/datasets/defaults.py:21-177): scenes are one file per sample
under ``<data_root>/<split>/``; train mode applies the transform pipeline;
test mode builds TTA-augmented complementary voxel fragments. Files may be
``.pth`` (torch pickles, loaded CPU-side for data compatibility with the
reference), ``.npz``, or ``.npy`` (dict pickles).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence
from copy import deepcopy

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose

VALID_ASSETS = (".pth", ".npz", ".npy")


def load_scene(path: str) -> dict:
    """Load a scene dict from .pth (torch pickle), .npz, or .npy."""
    if path.endswith(".pth"):
        import torch  # CPU-only torch is used purely as a data deserializer

        data = torch.load(path, map_location="cpu", weights_only=False)
        return {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in data.items()
        }
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as data:
            return {k: data[k] for k in data.files}
    if path.endswith(".npy"):
        return dict(np.load(path, allow_pickle=True).item())
    raise ValueError(f"unsupported scene format: {path}")


@DATASETS.register_module()
class DefaultDataset:
    def __init__(
        self,
        split="train",
        data_root="data/dataset",
        transform=None,
        test_mode=False,
        test_cfg=None,
        cache=False,
        loop=1,
    ):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1  # loop is a train-only knob
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        # host-memory scene cache (the reference's /dev/shm SharedArray
        # cache, utils/cache.py:20-56; threads share the dict directly)
        self.cache = cache
        self._cache: dict = {}

        if test_mode:
            self.test_voxelize = (
                TRANSFORMS.build(self.test_cfg["voxelize"])
                if self.test_cfg.get("voxelize") is not None
                else None
            )
            self.test_crop = (
                TRANSFORMS.build(self.test_cfg["crop"])
                if self.test_cfg.get("crop") is not None
                else None
            )
            self.post_transform = Compose(self.test_cfg.get("post_transform"))
            self.aug_transform = [
                Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])
            ]

        self.data_list = self.get_data_list()
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in {split} set."
        )

    def get_data_list(self):
        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        data_list = []
        for split in splits:
            for ext in VALID_ASSETS:
                data_list += glob.glob(os.path.join(self.data_root, split, f"*{ext}"))
        return sorted(data_list)

    def cache_all(self) -> int:
        """Preload every scene (DataCacheOperator hook)."""
        if not self.cache:
            self.cache = True
        for i in range(len(self.data_list)):
            self._cached_scene(i)
        return len(self.data_list)

    def _cached_scene(self, idx: int) -> dict:
        if not self.cache:
            return load_scene(self.data_list[idx])
        if idx not in self._cache:
            self._cache[idx] = load_scene(self.data_list[idx])
        return self._cache[idx]

    def get_data(self, idx):
        data = self._cached_scene(idx % len(self.data_list))
        if self.cache:
            # transforms may write in place; never hand out cached buffers
            data = {k: np.array(v) for k, v in data.items()}
        coord = data["coord"]
        segment = (
            data["semantic_gt"].reshape(-1)
            if "semantic_gt" in data
            else np.full(coord.shape[0], -1)
        )
        out = dict(coord=coord, segment=segment)
        for key in ("color", "normal", "strength"):
            if key in data:
                out[key] = data[key]
        if "instance_gt" in data:
            out["instance"] = data["instance_gt"].reshape(-1)
        return out

    def get_data_name(self, idx):
        return os.path.basename(self.data_list[idx % len(self.data_list)]).split(".")[0]

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        """Full-scene test protocol: TTA variants x complementary voxel
        fragments (+ optional covering crops), each post-transformed.

        Matches reference prepare_test_data (defaults.py:96-129): the
        returned dict holds the original-resolution labels plus the
        fragment list whose predictions are vote-merged by the tester.
        """
        data_dict = self.transform(self.get_data(idx))
        result = dict(segment=data_dict.pop("segment"), name=self.get_data_name(idx))
        if "origin_segment" in data_dict:
            assert "inverse" in data_dict
            result["origin_segment"] = data_dict.pop("origin_segment")
            result["inverse"] = data_dict.pop("inverse")

        fragments = []
        for aug in self.aug_transform:
            aug_data = aug(deepcopy(data_dict))
            if self.test_voxelize is not None:
                parts = self.test_voxelize(aug_data)
            else:
                aug_data["index"] = np.arange(aug_data["coord"].shape[0])
                parts = [aug_data]
            for part in parts:
                crops = self.test_crop(part) if self.test_crop is not None else [part]
                fragments += crops
        result["fragment_list"] = [self.post_transform(f) for f in fragments]
        return result

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ConcatDataset:
    def __init__(self, datasets, loop=1):
        self.datasets = [build_dataset(ds) for ds in datasets]
        self.loop = loop
        self.data_list = [
            (i, j) for i, ds in enumerate(self.datasets) for j in range(len(ds))
        ]
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in the concat set."
        )

    def get_data(self, idx):
        dataset_idx, data_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[dataset_idx][data_idx]

    def get_data_name(self, idx):
        dataset_idx, data_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[dataset_idx].get_data_name(data_idx)

    def __getitem__(self, idx):
        return self.get_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop
