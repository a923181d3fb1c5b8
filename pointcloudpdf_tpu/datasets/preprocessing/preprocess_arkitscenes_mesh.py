"""ARKitScenes 3DoD meshes -> per-scene coord/color/normal npz.

Reference contract: pointcept/datasets/preprocessing/arkitscenes/
preprocess_arkitscenes_mesh.py — walk ``<root>/3dod/<split>/<scene>/
<scene>_3dod_mesh.ply``, compute area-weighted vertex normals from the
triangle mesh, and save one file per scene under
``<output>/{Training,Validation}``.

This build reads PLY with the in-repo parser (no plyfile/open3d/pandas),
accumulates the face normals vectorized (np.add.at instead of a Python
loop over faces), and writes ``.npz``.

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_arkitscenes_mesh \
        --dataset_root data/raw/arkitscenes --output_root data/arkitscenes
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from .ply_io import read_mesh


def area_weighted_vertex_normals(coord, faces):
    """(N,3) f64 unit normals; each face's (unnormalized) cross product
    carries 2x its area, so plain accumulation is area weighting."""
    tri = coord[faces]
    face_n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    acc = np.zeros_like(coord, dtype=np.float64)
    for corner in range(3):
        np.add.at(acc, faces[:, corner], face_n)
    length = np.linalg.norm(acc, axis=1, keepdims=True) + 1e-8
    return acc / length


def parse_scene(mesh_path, output_root):
    scene_dir = os.path.dirname(mesh_path)
    scene_id = os.path.basename(scene_dir)
    split = os.path.basename(os.path.dirname(scene_dir))
    coord, color, _, faces = read_mesh(mesh_path)
    if color is None:
        color = np.zeros((len(coord), 3), np.uint8)
    normal = (area_weighted_vertex_normals(coord, faces)
              if faces is not None else np.zeros_like(coord))
    out_dir = os.path.join(output_root, split)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{scene_id}.npz")
    np.savez(
        out,
        coord=coord.astype(np.float32),
        color=color.astype(np.uint8),
        normal=normal.astype(np.float32),
        scene_id=scene_id,
    )
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="dir holding 3dod/{Training,Validation}/<scene>/")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    meshes = sorted(glob.glob(
        os.path.join(args.dataset_root, "3dod", "*", "*", "*_mesh.ply")))
    print(f"{len(meshes)} meshes")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for out in pool.map(parse_scene, meshes,
                            [args.output_root] * len(meshes)):
            print("wrote", out)


if __name__ == "__main__":
    main()
