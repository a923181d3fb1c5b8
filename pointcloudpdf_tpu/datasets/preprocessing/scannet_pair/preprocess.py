"""Per-scene orchestrator: .sens -> frames -> clouds -> overlap table.

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
preprocess.py — for every ``scans/scene*/*.sens``: export every 25th
frame (depth/color/pose/intrinsics), unproject to per-frame world
clouds, and compute the scene's pairwise overlap table.  Run
generate_list afterwards to build the global ``overlap30.txt``.

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.scannet_pair.preprocess \
        --dataset_root data/raw/scannet --output_root data/scannet_pair
    python -m pointcloudpdf_tpu.datasets.preprocessing.scannet_pair.generate_list \
        --target_dir data/scannet_pair
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

from .compute_overlap import compute_scene_overlap
from .extract_point_clouds import extract_scene_point_clouds
from .sensor_data import SensorData

FRAME_SKIP = 25


def process_sens_file(sens_path, output_root, frame_skip=FRAME_SKIP,
                      export_color=True):
    scene_id = os.path.basename(os.path.dirname(sens_path))
    scene_dir = os.path.join(output_root, scene_id)
    data = SensorData(sens_path)
    data.export_depth_images(os.path.join(scene_dir, "depth"), frame_skip)
    if export_color:
        data.export_color_images(os.path.join(scene_dir, "color"), frame_skip)
    data.export_poses(os.path.join(scene_dir, "pose"), frame_skip)
    data.export_intrinsics(os.path.join(scene_dir, "intrinsic"))
    extract_scene_point_clouds(scene_dir)
    compute_scene_overlap(output_root, scene_id)
    return scene_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="dir holding scans/scene*/<scene>.sens")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--frame_skip", type=int, default=FRAME_SKIP)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    sens_files = sorted(
        glob.glob(os.path.join(args.dataset_root, "scans", "scene*", "*.sens")))
    print(f"{len(sens_files)} scenes")
    os.makedirs(args.output_root, exist_ok=True)
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for scene_dir in pool.map(
            process_sens_file, sens_files,
            [args.output_root] * len(sens_files),
            [args.frame_skip] * len(sens_files),
        ):
            print("done", scene_dir)


if __name__ == "__main__":
    main()
