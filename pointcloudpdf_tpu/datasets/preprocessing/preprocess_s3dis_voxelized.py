"""Offline voxelization of already-processed S3DIS rooms.

Reference contract: pointcept/datasets/preprocessing/s3dis/
preprocess_s3dis_voxelized.py — walk ``<dataset_root>/*/*.pth``, apply
train-mode GridSample (fnv hash, one random point per voxel) over every
array key, and mirror the area/room layout under ``output_root``.  This
build reads the room files through :func:`..defaults.load_scene`
(.pth/.npz/.npy alike) and re-uses the repo's own
:class:`..transform.GridSample`, writing ``.npz``.

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.\
preprocess_s3dis_voxelized \
        --dataset_root data/s3dis --output_root data/s3dis_voxelized \
        [--voxel_size 0.01] [--num_workers 8]
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor


def voxelize_room(data_path: str, dataset_root: str, output_root: str,
                  voxel_size: float) -> str:
    import numpy as np

    from ..defaults import load_scene
    from ..transform import GridSample

    rel = os.path.relpath(data_path, dataset_root)
    base, _ = os.path.splitext(rel)
    out_path = os.path.join(output_root, base + ".npz")
    if os.path.isfile(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    data = load_scene(data_path)
    # subsample every per-point array key together (reference passes
    # keys=data.keys(); scalar metadata keys pass through untouched)
    n = len(data["coord"])
    point_keys = tuple(
        k for k, v in data.items()
        if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n
    )
    data = GridSample(
        grid_size=voxel_size, hash_type="fnv", mode="train", keys=point_keys
    )(data)
    np.savez(out_path, **data)
    print(f"{rel}: {n} -> {len(data['coord'])} points")
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="Path to processed S3DIS dataset")
    parser.add_argument("--output_root", required=True,
                        help="Output path mirroring the area folders")
    parser.add_argument("--voxel_size", default=0.01, type=float)
    parser.add_argument("--num_workers", default=os.cpu_count(), type=int)
    args = parser.parse_args()

    data_list = sorted(
        glob.glob(os.path.join(args.dataset_root, "*", "*.pth"))
        + glob.glob(os.path.join(args.dataset_root, "*", "*.npz"))
    )
    print(f"Voxelizing {len(data_list)} rooms...")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        list(pool.map(
            voxelize_room, data_list,
            [args.dataset_root] * len(data_list),
            [args.output_root] * len(data_list),
            [args.voxel_size] * len(data_list),
        ))


if __name__ == "__main__":
    main()
