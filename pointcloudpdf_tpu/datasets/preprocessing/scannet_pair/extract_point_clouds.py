"""Unproject exported RGB-D frames into world-frame partial clouds.

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
point_cloud_extractor.py — for every exported (pose, depth, color)
triple: mask zero depth, unproject through the depth intrinsic
(fx/fy/cx/cy + the ScanNet bx/by baseline terms), transform by the
camera-to-world pose, and save one cloud per frame under ``pcd/``.

This build reads the .npy frames the in-repo SensorData exporter writes,
vectorizes the unprojection, and emits ``<i>.npz`` with coord/color —
the layout ScanNetPairDataset loads.
"""

from __future__ import annotations

import glob
import os

import numpy as np

DEPTH_SHIFT = 1000.0  # uint16 depth is millimeters


def unproject_depth(depth, intrinsic, pose, color=None):
    """(H,W) uint16 depth -> (M,3) world coords (+ (M,3) colors)."""
    h, w = depth.shape
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    bx, by = intrinsic[0, 3], intrinsic[1, 3]
    v, u = np.nonzero(depth)
    z = depth[v, u].astype(np.float64) / DEPTH_SHIFT
    x = (u - cx) * z / fx + bx
    y = (v - cy) * z / fy + by
    cam = np.stack([x, y, z, np.ones_like(z)], axis=1)
    world = (cam @ pose.T)[:, :3]
    if color is None:
        return world.astype(np.float32), None
    if color.shape[:2] != depth.shape:
        sv = (v * color.shape[0]) // h
        su = (u * color.shape[1]) // w
        rgb = color[sv, su]
    else:
        rgb = color[v, u]
    return world.astype(np.float32), rgb


def extract_scene_point_clouds(scene_dir, output_dir=None):
    """Run the extractor over one exported scene dir; returns the written
    npz paths."""
    output_dir = output_dir or os.path.join(scene_dir, "pcd")
    os.makedirs(output_dir, exist_ok=True)
    intrinsic = np.loadtxt(
        os.path.join(scene_dir, "intrinsic", "intrinsic_depth.txt"))
    written = []
    by_index = lambda p: int(os.path.basename(p).split(".")[0])
    for depth_path in sorted(
        glob.glob(os.path.join(scene_dir, "depth", "*.npy")), key=by_index
    ):
        idx = by_index(depth_path)
        out = os.path.join(output_dir, f"{idx}.npz")
        if os.path.isfile(out):
            written.append(out)
            continue
        pose = np.loadtxt(os.path.join(scene_dir, "pose", f"{idx}.txt"))
        if not np.isfinite(pose).all():
            continue  # ScanNet marks untracked frames with -inf poses
        depth = np.load(depth_path)
        color_path = os.path.join(scene_dir, "color", f"{idx}.npy")
        color = np.load(color_path) if os.path.isfile(color_path) else None
        coord, rgb = unproject_depth(depth, intrinsic, pose, color)
        if len(coord) == 0:
            continue
        if rgb is None:
            rgb = np.zeros_like(coord, dtype=np.uint8)
        np.savez(out, coord=coord, color=rgb.astype(np.uint8))
        written.append(out)
    return written
