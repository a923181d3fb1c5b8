"""Structured3D zips -> fused per-room point clouds (npz).

Reference contract: pointcept/datasets/preprocessing/structured3d/
preprocess_structured3d.py — walk the ``Structured3D*.zip`` archives,
unproject every perspective frame (pinhole from half-angle focal
lengths) and/or the panorama (equirectangular), estimate normals from
the organized depth grid, filter grazing/invalid pixels
(|cos| > 0.15, depth valid, labeled), fuse per room, remap the raw
NYU-40-style ids onto the 25-class subset, and emit one file per room
under ``<output>/{train,val,test}`` split by scene id
(<3000 / <3250 / rest).

This build decodes images with cv2 (gated import), writes ``.npz``
(this framework's on-disk layout), and keeps all geometry in plain
numpy so the pipeline is testable on fabricated zips.

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_structured3d \
        --dataset_root data/raw/structured3d --output_root data/structured3d \
        --fuse_prsp --fuse_pano [--grid_size 0.01]
"""

from __future__ import annotations

import argparse
import os
import zipfile
from concurrent.futures import ProcessPoolExecutor

import numpy as np

IGNORE = -1

# raw semantic id -> compact 25-class train id (same 25-category subset
# the reference selects; order defines the train ids)
VALID_CLASS_IDS_25 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 14, 15, 16, 17, 18, 19, 22, 24, 25,
    32, 34, 35, 38, 39, 40,
)
CLASS_LABELS_25 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
)

# axis shuffles: the rendered camera frame is z-up-ish; these line the
# fused cloud up with the dataset's y-up convention and then swap to
# z-up for training (matches the reference's two matmuls)
_CAM_TO_WORLD_AXES = np.array([[0, 0, 1], [0, -1, 0], [1, 0, 0]], np.float32)
_Y_UP_TO_Z_UP = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
_Z2Y_TOP = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)


def _decode_image(buf, grayscale16=False):
    import cv2

    flag = cv2.IMREAD_UNCHANGED if grayscale16 else cv2.IMREAD_COLOR
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), flag)
    if img is None:
        raise ValueError("image decode failed")
    return img


class ZipSceneReader:
    """Random access over the (possibly multi-part) Structured3D zips."""

    def __init__(self, zip_paths):
        if isinstance(zip_paths, str):
            zip_paths = [zip_paths]
        self._zips = [zipfile.ZipFile(p, "r") for p in zip_paths]
        self._where = {}
        for i, zf in enumerate(self._zips):
            for name in zf.namelist():
                self._where[name] = i

    def names(self):
        return list(self._where)

    def listdir(self, prefix):
        prefix = prefix.strip("/") + "/"
        children = {
            n[len(prefix):].split("/", 1)[0]
            for n in self._where if n.startswith(prefix)
        }
        children.discard("")
        return sorted(children)

    def read(self, name):
        return self._zips[self._where[name]].read(name)

    def camera(self, name):
        """camera_pose.txt -> (R_cam2world (3,3), t_world (3,) meters,
        (fx_half_angle, fy_half_angle) | None)."""
        vals = np.fromstring(self.read(name), dtype=np.float32, sep=" ")
        t = _Z2Y_TOP @ (vals[:3] / 1000.0)
        if vals.shape[0] <= 3:  # panorama: position only
            return np.eye(3, dtype=np.float32), t, None
        front, up = vals[3:6], vals[6:9]
        right = np.cross(front, up)
        rot = _Z2Y_TOP @ np.stack([front, up, right], axis=1).astype(np.float32)
        return rot, t, vals[9:11]

    def depth(self, name):
        d = _decode_image(self.read(name), grayscale16=True)
        d = d.astype(np.float32)
        d[d == 0] = 65535.0  # zero depth = missing -> sentinel
        return d

    def color(self, name):
        bgr = _decode_image(self.read(name))
        return bgr[..., ::-1].copy()  # BGR -> RGB

    def semantic(self, name):
        return _decode_image(self.read(name), grayscale16=True).astype(np.int64)


def grid_normals(points_hw3):
    """Normals of an organized (H, W, 3) point grid via forward-difference
    cross products (symmetric edge padding keeps the shape)."""
    padded = np.pad(points_hw3, ((0, 1), (0, 1), (0, 0)), mode="symmetric")
    dv = (padded[:-1, :, :] - padded[1:, :, :])[:, :-1, :]
    du = (padded[:, :-1, :] - padded[:, 1:, :])[:-1, :, :]
    n = np.cross(dv, du)
    length = np.linalg.norm(n, axis=-1, keepdims=True)
    return np.divide(n, length, out=np.zeros_like(n), where=length > 0)


def _keep_mask(coord_cam, normal, depth, segment):
    """Drop grazing-angle, missing-depth, and unlabeled pixels."""
    dist = np.maximum(np.linalg.norm(coord_cam, axis=-1), 1e-4)
    cos = np.abs(np.sum(coord_cam * normal, axis=-1) / dist)
    return (cos > 0.15) & (depth < 65535.0) & (segment > 0)


def unproject_perspective(depth, fx_half, fy_half):
    """Pinhole unprojection -> camera-frame (H, W, 3) in millimeters.

    Structured3D stores half field-of-view angles; principal point at the
    image center."""
    h, w = depth.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    fx = cx / np.tan(fx_half)
    fy = cy / np.tan(fy_half)
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    rays = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    return (depth[..., None] * rays) @ _CAM_TO_WORLD_AXES


def unproject_panorama(depth):
    """Equirectangular unprojection -> camera-frame (H, W, 3) mm."""
    h, w = depth.shape[:2]
    lon = (np.arange(w, dtype=np.float32) / w) * 2 * np.pi - np.pi
    lat = np.pi / 2 - (np.arange(h, dtype=np.float32) / h) * np.pi
    lon = np.broadcast_to(lon[None, :], (h, w))
    lat = np.broadcast_to(lat[:, None], (h, w))
    x = depth * np.cos(lon) * np.cos(lat)
    y = depth * np.sin(lat)
    z = depth * np.sin(lon) * np.cos(lat)
    return np.stack([x, y, z], axis=-1)


def scene_split(scene_name):
    scene_id = int(scene_name.split("_")[-1])
    if scene_id < 3000:
        return "train"
    if scene_id < 3250:
        return "val"
    return "test"


def _fuse_view(coord_world, color, segment_hw, keep):
    keep = keep.reshape(-1)
    if not keep.any():
        return None
    normal_world = grid_normals(coord_world).reshape(-1, 3)[keep]
    return (
        coord_world.reshape(-1, 3)[keep],
        color.reshape(-1, 3)[keep],
        normal_world,
        segment_hw.reshape(-1)[keep],
    )


def parse_scene(scene, dataset_root, output_root, ignore_index=IGNORE,
                grid_size=None, fuse_prsp=True, fuse_pano=True):
    assert fuse_prsp or fuse_pano
    reader = ZipSceneReader(_zip_list(dataset_root))
    split = scene_split(scene)
    scene_dir = os.path.join(output_root, split, scene)
    os.makedirs(scene_dir, exist_ok=True)
    written = []
    for room in reader.listdir(f"Structured3D/{scene}/2D_rendering"):
        room_path = f"Structured3D/{scene}/2D_rendering/{room}"
        views = []
        if fuse_prsp:
            prsp = f"{room_path}/perspective/full"
            for frame in reader.listdir(prsp):
                try:
                    rot, t, f_half = reader.camera(f"{prsp}/{frame}/camera_pose.txt")
                    depth = reader.depth(f"{prsp}/{frame}/depth.png")
                    color = reader.color(f"{prsp}/{frame}/rgb_rawlight.png")
                    segment = reader.semantic(f"{prsp}/{frame}/semantic.png")
                except Exception:
                    continue
                cam = unproject_perspective(depth, f_half[0], f_half[1])
                keep = _keep_mask(cam, grid_normals(cam), depth, segment)
                world = (cam / 1000.0) @ rot.T + t
                view = _fuse_view(world, color, segment, keep)
                if view is not None:
                    views.append(view)
        if fuse_pano:
            pano = f"{room_path}/panorama"
            try:
                _, t, _ = reader.camera(f"{pano}/camera_xyz.txt")
                depth = reader.depth(f"{pano}/full/depth.png")
                color = reader.color(f"{pano}/full/rgb_rawlight.png")
                segment = reader.semantic(f"{pano}/full/semantic.png")
            except Exception:
                pass
            else:
                cam = unproject_panorama(depth)
                keep = _keep_mask(cam, grid_normals(cam), depth, segment)
                view = _fuse_view(cam / 1000.0 + t, color, segment, keep)
                if view is not None:
                    views.append(view)
        if not views:
            continue
        coord = np.concatenate([v[0] for v in views]) @ _Y_UP_TO_Z_UP
        color = np.concatenate([v[1] for v in views])
        normal = np.concatenate([v[2] for v in views]) @ _Y_UP_TO_Z_UP
        raw_seg = np.concatenate([v[3] for v in views])
        segment = np.full(raw_seg.shape, ignore_index, np.int16)
        for train_id, raw_id in enumerate(VALID_CLASS_IDS_25):
            segment[raw_seg == raw_id] = train_id
        data = dict(
            coord=coord.astype(np.float32),
            color=color.astype(np.uint8),
            normal=normal.astype(np.float32),
            semantic_gt=segment,
        )
        if grid_size is not None:
            from ..transform import GridSample

            data = GridSample(
                grid_size=grid_size,
                keys=("coord", "color", "normal", "semantic_gt"),
            )(data)
            data.pop("grid_coord", None)
        out = os.path.join(scene_dir, f"room_{room}.npz")
        np.savez(out, **data)
        written.append(out)
    return written


def _zip_list(dataset_root):
    return sorted(
        os.path.join(dataset_root, f)
        for f in os.listdir(dataset_root) if f.endswith(".zip")
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="dir holding the Structured3D zip parts")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--grid_size", type=float, default=None)
    parser.add_argument("--ignore_index", type=int, default=IGNORE)
    parser.add_argument("--fuse_prsp", action="store_true")
    parser.add_argument("--fuse_pano", action="store_true")
    args = parser.parse_args()

    scenes = ZipSceneReader(_zip_list(args.dataset_root)).listdir("Structured3D")
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(args.output_root, split), exist_ok=True)
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for scene, outs in zip(scenes, pool.map(
            parse_scene, scenes, [args.dataset_root] * len(scenes),
            [args.output_root] * len(scenes),
            [args.ignore_index] * len(scenes), [args.grid_size] * len(scenes),
            [args.fuse_prsp] * len(scenes), [args.fuse_pano] * len(scenes),
        )):
            print(f"{scene}: wrote {len(outs)} rooms")


if __name__ == "__main__":
    main()
