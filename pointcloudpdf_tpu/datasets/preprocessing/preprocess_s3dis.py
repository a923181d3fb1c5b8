"""S3DIS raw-annotation -> per-room scene files.

Reference contract: pointcept/datasets/preprocessing/s3dis/
preprocess_s3dis.py — each room under ``Area_*/<room>/Annotations``
holds one txt per object (``<class>_<k>.txt`` with x y z r g b rows);
rooms concatenate into coord/color/semantic_gt/instance_gt arrays saved
per room under ``<output>/<Area>/<room>``.  This build saves ``.npz``
(our loader reads .pth/.npz/.npy alike) and skips the optional
open3d/trimesh normal estimation (zero-egress image has neither).

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_s3dis \
        --dataset_root data/raw/Stanford3dDataset_v1.2 \
        --output_root data/s3dis
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]
CLASS2ID = {name: i for i, name in enumerate(CLASS_NAMES)}


def parse_room(room_dir: str, output_root: str, align_angle: bool = False):
    area = os.path.basename(os.path.dirname(room_dir))
    room = os.path.basename(room_dir)
    out_path = os.path.join(output_root, area, f"{room}.npz")
    if os.path.isfile(out_path):
        return out_path
    coords, colors, semantics, instances = [], [], [], []
    ann_files = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    for inst_id, path in enumerate(ann_files):
        cls_name = os.path.basename(path).split("_")[0]
        cls = CLASS2ID.get(cls_name, CLASS2ID["clutter"])
        # a handful of files in the release carry stray characters;
        # skip malformed rows rather than aborting the room
        data = _robust_loadtxt(path)
        coords.append(data[:, :3])
        colors.append(data[:, 3:6])
        n = len(data)
        semantics.append(np.full(n, cls, np.int16))
        instances.append(np.full(n, inst_id, np.int16))
    coord = np.concatenate(coords).astype(np.float32)
    coord -= coord.min(0)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(
        out_path,
        coord=coord,
        color=np.concatenate(colors).astype(np.uint8),
        semantic_gt=np.concatenate(semantics),
        instance_gt=np.concatenate(instances),
    )
    return out_path


def _robust_loadtxt(path: str) -> np.ndarray:
    rows = []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 6:
                try:
                    rows.append([float(v) for v in parts[:6]])
                except ValueError:
                    continue
    return np.asarray(rows, np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    rooms = sorted(
        d for d in glob.glob(os.path.join(args.dataset_root, "Area_*", "*"))
        if os.path.isdir(os.path.join(d, "Annotations"))
    )
    print(f"Processing {len(rooms)} rooms ...")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for out in pool.map(
            parse_room, rooms, [args.output_root] * len(rooms)
        ):
            print("  wrote", out)


if __name__ == "__main__":
    main()
