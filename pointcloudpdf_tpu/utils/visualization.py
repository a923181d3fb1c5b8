"""Point-cloud visualization dumps (reference utils/visualization.py:21-89).

The reference writes .ply via open3d; this build writes ASCII/binary PLY
directly (no open3d in the image) with the same call signatures.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_numpy(x) -> np.ndarray:
    import jax

    return np.asarray(jax.device_get(x))


def save_point_cloud(coord, color=None, file_path="pc.ply", binary=True,
                     logger=None):
    """Write (N, 3) coords (+ optional (N, 3) float/uint8 colors) as PLY."""
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    coord = to_numpy(coord).astype(np.float32)
    n = len(coord)
    if color is None:
        color = np.full((n, 3), 127, np.uint8)
    else:
        color = to_numpy(color)
        if color.dtype != np.uint8:
            color = np.clip(color * 255 if color.max() <= 1.0 else color,
                            0, 255).astype(np.uint8)
        if color.ndim == 1:
            color = np.tile(color.reshape(1, 3), (n, 1))

    header = (
        "ply\n"
        + ("format binary_little_endian 1.0\n" if binary
           else "format ascii 1.0\n")
        + f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    if binary:
        rec = np.zeros(
            n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)]
        )
        rec["xyz"] = coord
        rec["rgb"] = color
        with open(file_path, "wb") as f:
            f.write(header.encode())
            f.write(rec.tobytes())
    else:
        with open(file_path, "w") as f:
            f.write(header)
            for (x, y, z), (r, g, b) in zip(coord, color):
                f.write(f"{x} {y} {z} {r} {g} {b}\n")
    if logger is not None:
        logger.info(f"Saved point cloud to: {file_path}")


def save_bounding_boxes(bboxes_corners, color=(1.0, 0.0, 0.0),
                        file_path="bbox.ply", logger=None):
    """Write bbox corner sets as a colored point cloud (corner dump)."""
    corners = to_numpy(bboxes_corners).reshape(-1, 3)
    save_point_cloud(corners, np.asarray(color, np.float32), file_path,
                     logger=logger)


def save_lines(points, lines, file_path="lines.ply", logger=None):
    """Write a PLY line set (edge elements)."""
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    points = to_numpy(points).astype(np.float32)
    lines = to_numpy(lines).astype(np.int32)
    with open(file_path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element edge {len(lines)}\n"
            "property int vertex1\nproperty int vertex2\nend_header\n"
        )
        for p in points:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        for a, b in lines:
            f.write(f"{a} {b}\n")
    if logger is not None:
        logger.info(f"Saved lines to: {file_path}")
