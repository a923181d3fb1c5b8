"""ScanNet frame-pair dataset for point-contrast style pretraining.

Reference: pointcept/datasets/scannet_pair.py — pairs of partial frames
with >=30% overlap listed per scene in ``pcd/overlap.txt``; each sample
yields view1/view2 coord+color dicts run through a shared transform.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .defaults import load_scene
from .transform import TRANSFORMS, Compose


@DATASETS.register_module()
class ScanNetPairDataset:
    def __init__(
        self,
        data_root="data/scannet_pair",
        overlap_threshold=0.3,
        view1_transform=None,
        view2_transform=None,
        transform=None,
        test_mode=False,
        test_cfg=None,
        loop=1,
    ):
        self.data_root = data_root
        self.overlap_threshold = overlap_threshold
        self.view1_transform = Compose(view1_transform)
        self.view2_transform = Compose(view2_transform)
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.data_list = self.get_data_list()
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} pairs."
        )

    def get_data_list(self):
        data_list = []
        for overlap_file in glob.glob(
            os.path.join(self.data_root, "*", "pcd", "overlap.txt")
        ):
            pcd_dir = os.path.dirname(overlap_file)
            with open(overlap_file) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) < 3:
                        continue
                    a, b, overlap = parts[0], parts[1], float(parts[2])
                    if overlap >= self.overlap_threshold:
                        data_list.append(
                            (os.path.join(pcd_dir, os.path.basename(a)),
                             os.path.join(pcd_dir, os.path.basename(b)))
                        )
        return data_list

    def get_data(self, idx):
        path1, path2 = self.data_list[idx % len(self.data_list)]
        v1 = load_scene(path1)
        v2 = load_scene(path2)
        return dict(
            view1_coord=np.asarray(v1["coord"], np.float32),
            view1_color=np.asarray(v1.get("color", np.zeros_like(v1["coord"])),
                                   np.float32),
            view2_coord=np.asarray(v2["coord"], np.float32),
            view2_color=np.asarray(v2.get("color", np.zeros_like(v2["coord"])),
                                   np.float32),
        )

    def get_data_name(self, idx):
        path1, _ = self.data_list[idx % len(self.data_list)]
        return os.path.splitext(os.path.basename(path1))[0]

    def __getitem__(self, idx):
        data = self.get_data(idx)
        view1 = {k[len("view1_"):]: v for k, v in data.items()
                 if k.startswith("view1_")}
        view2 = {k[len("view2_"):]: v for k, v in data.items()
                 if k.startswith("view2_")}
        view1 = self.view1_transform(view1)
        view2 = self.view2_transform(view2)
        out = {f"view1_{k}": v for k, v in view1.items()}
        out.update({f"view2_{k}": v for k, v in view2.items()})
        return self.transform(out)

    def __len__(self):
        return len(self.data_list) * self.loop
