"""Pairwise overlap ratios between a scene's partial frame clouds.

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
compute_full_overlapping.py — voxel-downsample every frame cloud
(5 cm), count each cloud's points that have a neighbor within
1.5 * voxel_size in the other cloud, take the symmetric max ratio, and
write ``pcd/overlap.txt`` lines ``<path_i> <path_j> <ratio>`` for i<j.

open3d's KDTree/voxel pipeline is replaced by scipy cKDTree + a numpy
grid hash (first point per occupied voxel, like open3d's down sample
up to the in-voxel representative choice).
"""

from __future__ import annotations

import glob
import os

import numpy as np


def voxel_downsample(coord, voxel_size):
    """Keep one representative point per occupied voxel."""
    if len(coord) == 0:
        return coord
    grid = np.floor(coord / voxel_size).astype(np.int64)
    _, keep = np.unique(grid, axis=0, return_index=True)
    return coord[np.sort(keep)]


def _match_fraction(query, tree, radius):
    """Fraction of ``query`` points with a neighbor within ``radius``."""
    if len(query) == 0:
        return 0.0
    dist, _ = tree.query(query, k=1, distance_upper_bound=radius)
    return float(np.mean(np.isfinite(dist)))


def compute_scene_overlap(data_root, scene_id, voxel_size=0.05):
    """Write ``<data_root>/<scene_id>/pcd/overlap.txt``; returns the rows."""
    from scipy.spatial import cKDTree

    pcd_dir = os.path.join(data_root, scene_id, "pcd")
    paths = sorted(
        glob.glob(os.path.join(pcd_dir, "*.npz")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    )
    clouds, names = [], []
    for path in paths:
        coord = np.load(path)["coord"]
        if np.isnan(coord).any():
            continue
        clouds.append(voxel_downsample(coord[:, :3], voxel_size))
        names.append(path)

    trees = [cKDTree(c) if len(c) else None for c in clouds]
    radius = 1.5 * voxel_size
    n = len(clouds)
    frac = np.zeros((n, n))
    for i in range(n):
        if trees[i] is None:
            continue
        for j in range(n):
            if i != j:
                frac[i, j] = _match_fraction(clouds[j], trees[i], radius)

    rows = []
    rel = lambda p: os.path.relpath(p, data_root)
    with open(os.path.join(pcd_dir, "overlap.txt"), "w") as f:
        for i in range(n):
            for j in range(i + 1, n):
                overlap = max(frac[i, j], frac[j, i])
                f.write(f"{rel(names[i])} {rel(names[j])} {overlap}\n")
                rows.append((names[i], names[j], overlap))
    return rows
