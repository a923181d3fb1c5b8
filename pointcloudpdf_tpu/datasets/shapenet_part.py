"""ShapeNetPart part segmentation dataset.

Reference: pointcept/datasets/shapenet_part.py — txt point files
(x y z nx ny nz part_id) under synset folders, official shuffled split
jsons, 16 categories / 50 parts with per-category part-id ranges.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose

CATEGORY2PART = {
    "Airplane": [0, 1, 2, 3], "Bag": [4, 5], "Cap": [6, 7],
    "Car": [8, 9, 10, 11], "Chair": [12, 13, 14, 15],
    "Earphone": [16, 17, 18], "Guitar": [19, 20, 21], "Knife": [22, 23],
    "Lamp": [24, 25, 26, 27], "Laptop": [28, 29],
    "Motorbike": [30, 31, 32, 33, 34, 35], "Mug": [36, 37],
    "Pistol": [38, 39, 40], "Rocket": [41, 42, 43],
    "Skateboard": [44, 45, 46], "Table": [47, 48, 49],
}


@DATASETS.register_module()
class ShapeNetPartDataset:
    def __init__(
        self,
        split="train",
        data_root="data/shapenetcore_partanno_segmentation_benchmark_v0_normal",
        transform=None,
        test_mode=False,
        test_cfg=None,
        loop=1,
    ):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self.cache = {}

        self.categories = []
        self.token2category = {}
        with open(os.path.join(data_root, "synsetoffset2category.txt")) as f:
            for line in f:
                name, token = line.strip().split()
                self.token2category[token] = len(self.categories)
                self.categories.append(name)
        self.category2part = CATEGORY2PART

        if test_mode:
            self.post_transform = Compose(test_cfg.get("post_transform"))
            self.aug_transform = [
                Compose(aug) for aug in test_cfg.get("aug_transform", [[]])
            ]

        splits = [split] if isinstance(split, str) else list(split)
        self.data_list = []
        for s in splits:
            self.data_list += self._load_split(s)
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in {split} set."
        )

    def _load_split(self, split):
        split_file = os.path.join(
            self.data_root, "train_test_split",
            f"shuffled_{split}_file_list.json",
        )
        with open(split_file) as f:
            entries = json.load(f)
        # entries look like "shape_data/<token>/<name>"
        return [
            os.path.join(self.data_root, *e.split("/")[1:]) + ".txt"
            for e in entries
        ]

    def get_data(self, idx):
        data_idx = idx % len(self.data_list)
        if data_idx in self.cache:
            coord, normal, segment, category = self.cache[data_idx]
        else:
            path = self.data_list[data_idx]
            data = np.loadtxt(path).astype(np.float32)
            category = self.token2category[os.path.basename(os.path.dirname(path))]
            coord = data[:, :3]
            normal = data[:, 3:6]
            segment = data[:, 6].astype(np.int64)
            self.cache[data_idx] = (coord, normal, segment, category)
        return dict(
            coord=coord.copy(), normal=normal.copy(), segment=segment.copy(),
            category=np.array([category], np.int64),
        )

    def get_data_name(self, idx):
        return os.path.splitext(
            os.path.basename(self.data_list[idx % len(self.data_list)])
        )[0]

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        data_dict = self.get_data(idx)
        result = dict(
            segment=data_dict.pop("segment"),
            cls_token=int(data_dict["category"][0]),
            name=self.get_data_name(idx),
        )
        fragments = []
        for aug in self.aug_transform:
            d = aug(dict(data_dict))
            d["index"] = np.arange(d["coord"].shape[0])
            fragments.append(self.post_transform(d))
        result["fragment_list"] = fragments
        return result

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop
