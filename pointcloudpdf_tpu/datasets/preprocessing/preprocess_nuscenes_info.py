"""Build nuScenes info pickles straight from the relational JSON tables.

Reference contract: pointcept/datasets/preprocessing/nuscenes/
preprocess_nuscenes_info.py — per keyframe sample emit an info dict
with ``lidar_path`` / ``lidar_token`` / ``gt_segment_path`` (lidarseg
labels), ``max_sweeps-1`` preceding sweeps each carrying the
sensor->reference-lidar ``transform_matrix``, the ``ref_from_car`` /
``car_from_global`` homogeneous transforms, timestamps, and (trainval)
gt boxes; split train/val by the official scene lists and dump
``nuscenes_infos_{max_sweeps}sweeps_{split}.pkl``.

The reference drives the nuscenes devkit; this build parses the
``v1.0-*/*.json`` tables directly (the devkit is absent in this image
and the tables are plain JSON), with the quaternion/homogeneous-
transform math in numpy.  Velocity needs the devkit's neighbor-
annotation differencing, so ``gt_boxes`` carry zero velocity columns
(segmentation — this framework's workload — never reads them).

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_nuscenes_info \
        --dataset_root data/raw/nuscenes --output_root data/nuscenes/info \
        --version v1.0-trainval --max_sweeps 10
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

# official trainval split: scene names (mini versions ship their own)
_SPLIT_BY_VERSION = {
    "v1.0-trainval": ("train", "val"),
    "v1.0-mini": ("mini_train", "mini_val"),
    "v1.0-test": ("test",),
}


def quaternion_to_rotation(q):
    """nuScenes stores [w, x, y, z]."""
    w, x, y, z = (float(v) for v in q)
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(3)
    s = 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ])


def transform_matrix(translation, rotation_q, inverse=False):
    """4x4 homogeneous pose (or its inverse) from t + quaternion."""
    rot = quaternion_to_rotation(rotation_q)
    tm = np.eye(4)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ np.asarray(translation, np.float64)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = translation
    return tm


def quaternion_yaw(q):
    """Heading of the rotated x-axis in the xy plane."""
    fwd = quaternion_to_rotation(q) @ np.array([1.0, 0.0, 0.0])
    return float(np.arctan2(fwd[1], fwd[0]))


class NuScenesTables:
    """Indexing layer over the raw JSON tables (token -> record)."""

    TABLES = ("scene", "sample", "sample_data", "ego_pose",
              "calibrated_sensor", "sensor")
    OPTIONAL = ("lidarseg", "sample_annotation", "category")

    def __init__(self, dataset_root, version):
        self.root = dataset_root
        table_dir = os.path.join(dataset_root, version)
        self._by_token = {}
        self.tables = {}
        for name in self.TABLES + self.OPTIONAL:
            path = os.path.join(table_dir, f"{name}.json")
            rows = json.load(open(path)) if os.path.isfile(path) else []
            self.tables[name] = rows
            self._by_token[name] = {r["token"]: r for r in rows}
        # lidarseg is keyed by sample_data_token, not its own token
        self.lidarseg_by_sd = {
            r["sample_data_token"]: r for r in self.tables["lidarseg"]
        }
        self.anns_by_sample = {}
        for r in self.tables["sample_annotation"]:
            self.anns_by_sample.setdefault(r["sample_token"], []).append(r)

    def get(self, table, token):
        return self._by_token[table][token]

    def ordered_samples(self):
        """Samples in scene order, following each scene's linked list."""
        out = []
        for scene in self.tables["scene"]:
            token = scene["first_sample_token"]
            while token:
                sample = self.get("sample", token)
                out.append(sample)
                token = sample["next"]
        return out

    def lidar_top_sd(self, sample):
        """The keyframe LIDAR_TOP sample_data record for a sample."""
        for sd in self.tables["sample_data"]:
            if (sd["sample_token"] == sample["token"]
                    and sd["is_key_frame"]
                    and sd["filename"].startswith("samples/LIDAR_TOP")):
                return sd
        raise KeyError(f"no keyframe LIDAR_TOP for sample {sample['token']}")


def build_sample_info(tables, sample, max_sweeps=10, test=False):
    ref_sd = tables.lidar_top_sd(sample)
    ref_cs = tables.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])
    ref_pose = tables.get("ego_pose", ref_sd["ego_pose_token"])
    ref_time = 1e-6 * ref_sd["timestamp"]
    ref_from_car = transform_matrix(
        ref_cs["translation"], ref_cs["rotation"], inverse=True)
    car_from_global = transform_matrix(
        ref_pose["translation"], ref_pose["rotation"], inverse=True)

    info = {
        "lidar_path": ref_sd["filename"],
        "lidar_token": ref_sd["token"],
        "token": sample["token"],
        "sweeps": [],
        "ref_from_car": ref_from_car,
        "car_from_global": car_from_global,
        "timestamp": ref_time,
    }

    # walk the sample_data prev-chain for preceding sweeps
    sweeps = []
    cursor = ref_sd
    while len(sweeps) < max_sweeps - 1:
        if cursor["prev"] == "":
            # pad with the reference frame itself (first sweep) or repeat
            # the oldest collected sweep, keeping a fixed sweep count
            if not sweeps:
                sweeps.append({
                    "lidar_path": ref_sd["filename"],
                    "sample_data_token": cursor["token"],
                    "transform_matrix": None,
                    "time_lag": 0.0,
                })
            else:
                sweeps.append(sweeps[-1])
            continue
        cursor = tables.get("sample_data", cursor["prev"])
        pose = tables.get("ego_pose", cursor["ego_pose_token"])
        cs = tables.get("calibrated_sensor", cursor["calibrated_sensor_token"])
        global_from_car = transform_matrix(
            pose["translation"], pose["rotation"], inverse=False)
        car_from_current = transform_matrix(
            cs["translation"], cs["rotation"], inverse=False)
        tm = ref_from_car @ car_from_global @ global_from_car @ car_from_current
        sweeps.append({
            "lidar_path": cursor["filename"],
            "sample_data_token": cursor["token"],
            "transform_matrix": tm,
            "global_from_car": global_from_car,
            "car_from_current": car_from_current,
            "time_lag": ref_time - 1e-6 * cursor["timestamp"],
        })
    info["sweeps"] = sweeps

    if not test:
        seg = tables.lidarseg_by_sd.get(ref_sd["token"])
        if seg is not None:
            info["gt_segment_path"] = seg["filename"]
        anns = tables.anns_by_sample.get(sample["token"], [])
        if anns:
            # boxes in the reference-lidar frame: global -> car -> lidar
            kept = [a for a in anns
                    if a.get("num_lidar_pts", 0) + a.get("num_radar_pts", 0) > 0]
            centers, dims, yaws, names = [], [], [], []
            lidar_from_global = ref_from_car @ car_from_global
            for a in kept:
                center = lidar_from_global @ np.append(
                    np.asarray(a["translation"], np.float64), 1.0)
                centers.append(center[:3])
                w, l, h = a["size"]  # nuScenes order: width, length, height
                dims.append([l, w, h])
                rot_global = quaternion_to_rotation(a["rotation"])
                fwd = lidar_from_global[:3, :3] @ rot_global @ np.array(
                    [1.0, 0.0, 0.0])
                yaws.append(np.arctan2(fwd[1], fwd[0]))
                cat = tables._by_token["category"].get(
                    a.get("category_token", ""), None)
                names.append(cat["name"] if cat else a.get("category_name", ""))
            n_box = len(kept)
            gt = np.zeros((n_box, 9))
            if n_box:
                gt[:, :3] = centers
                gt[:, 3:6] = dims
                gt[:, 6] = yaws
            info["gt_boxes"] = gt
            info["gt_boxes_velocity"] = np.zeros((n_box, 3))
            info["gt_names"] = np.asarray(names)
            info["gt_boxes_token"] = np.asarray([a["token"] for a in kept])
            info["num_lidar_pts"] = np.asarray(
                [a.get("num_lidar_pts", 0) for a in kept])
            info["num_radar_pts"] = np.asarray(
                [a.get("num_radar_pts", 0) for a in kept])
    return info


def build_infos(dataset_root, version="v1.0-trainval", max_sweeps=10,
                train_scene_names=None):
    """Returns {split: [info, ...]} keyed 'train'/'val' (or 'test')."""
    tables = NuScenesTables(dataset_root, version)
    test = version == "v1.0-test"
    scene_by_token = {s["token"]: s for s in tables.tables["scene"]}
    if train_scene_names is None and not test:
        # default split: scenes listed in splits.json if present, else
        # everything is train
        splits_path = os.path.join(dataset_root, version, "splits.json")
        if os.path.isfile(splits_path):
            train_scene_names = set(json.load(open(splits_path))["train"])
        else:
            train_scene_names = {s["name"] for s in tables.tables["scene"]}
    out = {"test": []} if test else {"train": [], "val": []}
    for sample in tables.ordered_samples():
        info = build_sample_info(tables, sample, max_sweeps, test=test)
        if test:
            out["test"].append(info)
        else:
            scene = scene_by_token[sample["scene_token"]]
            key = "train" if scene["name"] in train_scene_names else "val"
            out[key].append(info)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--version", default="v1.0-trainval",
                        choices=sorted(_SPLIT_BY_VERSION))
    parser.add_argument("--max_sweeps", type=int, default=10)
    args = parser.parse_args()

    infos = build_infos(args.dataset_root, args.version, args.max_sweeps)
    os.makedirs(args.output_root, exist_ok=True)
    for split, rows in infos.items():
        path = os.path.join(
            args.output_root,
            f"nuscenes_infos_{args.max_sweeps}sweeps_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(rows, f)
        print(f"{split}: {len(rows)} infos -> {path}")


if __name__ == "__main__":
    main()
