"""ModelNet40 classification dataset (reference: pointcept/datasets/modelnet.py).

Text point files (x,y,z,nx,ny,nz per line, comma-separated), split lists in
``modelnet40_{split}.txt``; labels come from the shape-name prefix.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose


@DATASETS.register_module()
class ModelNetDataset:
    def __init__(
        self,
        split="train",
        data_root="data/modelnet40_normal_resampled",
        class_names=None,
        transform=None,
        test_mode=False,
        test_cfg=None,
        cache_data=False,
        loop=1,
    ):
        self.data_root = data_root
        self.class_names = dict(zip(class_names, range(len(class_names))))
        self.split = split
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.cache_data = cache_data
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self.cache = {}
        self.data_list = self.get_data_list()
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in {split} set."
        )

    def get_data_list(self):
        assert isinstance(self.split, str)
        split_path = os.path.join(self.data_root, f"modelnet40_{self.split}.txt")
        return np.loadtxt(split_path, dtype=str).tolist()

    def get_data(self, idx):
        data_idx = idx % len(self.data_list)
        if self.cache_data and data_idx in self.cache:
            coord, normal, category = self.cache[data_idx]
        else:
            entry = self.data_list[data_idx]
            shape_name = "_".join(entry.split("_")[:-1])
            path = os.path.join(self.data_root, shape_name, entry + ".txt")
            data = np.loadtxt(path, delimiter=",").astype(np.float32)
            coord, normal = data[:, 0:3], data[:, 3:6]
            category = np.array([self.class_names[shape_name]])
            if self.cache_data:
                self.cache[data_idx] = (coord, normal, category)
        return dict(coord=coord, normal=normal, category=category)

    def get_data_name(self, idx):
        return self.data_list[idx % len(self.data_list)]

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        assert idx < len(self.data_list)
        return self.transform(self.get_data(idx))

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop
