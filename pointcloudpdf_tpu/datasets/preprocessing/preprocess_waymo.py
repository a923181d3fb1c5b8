"""Waymo Open Dataset tfrecords -> KITTI-style velodyne/labels files.

Reference contract: pointcept/datasets/preprocessing/waymo/
preprocess_waymo.py — for each of the 1150 segment tfrecords, keep only
frames that carry a compressed segmentation label, merge both lidar
returns, and write per-frame ``velodyne/<idx>.bin`` (x, y, z, intensity
float32) plus ``labels/<idx>.label`` ((instance, semantic) int32 pairs)
under ``<output>/<split>/<segment>/``.

Decoding a Waymo Frame proto requires the ``waymo_open_dataset`` devkit
(range-image -> point-cloud projection), which is not in this image, so
the proto-touching path imports it lazily.  The serialization helpers
(point/label packing, frame naming) are pure numpy and unit-tested; the
WaymoDataset loader consumes exactly their output layout.

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_waymo \
        --dataset_root data/raw/waymo --output_root data/waymo \
        --splits training validation
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def frame_index_name(count):
    """000000-style, matching the reference's zero-padded frame ids."""
    return f"{count:06d}"


def pack_velodyne(points_xyz, intensity):
    """(N,3) + (N,) -> flat float32 buffer laid out (x, y, z, intensity)."""
    points_xyz = np.asarray(points_xyz, np.float32).reshape(-1, 3)
    intensity = np.asarray(intensity, np.float32).reshape(-1, 1)
    return np.concatenate([points_xyz, intensity], axis=1).reshape(-1)


def pack_labels(instance_ids, semantic_ids):
    """(N,) + (N,) -> flat int32 buffer of (instance, semantic) pairs."""
    instance_ids = np.asarray(instance_ids, np.int32).reshape(-1, 1)
    semantic_ids = np.asarray(semantic_ids, np.int32).reshape(-1, 1)
    return np.concatenate([instance_ids, semantic_ids], axis=1).reshape(-1)


def write_frame(save_path, count, points_xyz, intensity, point_labels=None):
    """Emit one frame's velodyne bin (+ labels) into the split layout."""
    idx = frame_index_name(count)
    os.makedirs(os.path.join(save_path, "velodyne"), exist_ok=True)
    pack_velodyne(points_xyz, intensity).tofile(
        os.path.join(save_path, "velodyne", f"{idx}.bin"))
    if point_labels is not None:
        os.makedirs(os.path.join(save_path, "labels"), exist_ok=True)
        pack_labels(point_labels[:, 0], point_labels[:, 1]).tofile(
            os.path.join(save_path, "labels", f"{idx}.label"))


def _frame_points_and_labels(frame):
    """Devkit-backed: merge both returns of all lidars -> points + labels."""
    import tensorflow.compat.v1 as tf  # noqa: F401 (devkit expects TF1 shims)
    from waymo_open_dataset.utils import frame_utils

    parsed = frame_utils.parse_range_image_and_camera_projection(frame)
    range_images, camera_projections, segmentation_labels, top_pose = parsed

    points_both, labels_both = [], []
    for ri_index in (0, 1):
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, top_pose,
            ri_index=ri_index, keep_polar_features=True)
        # keep_polar_features rows: (range, intensity, elongation, x, y, z)
        pts = np.concatenate(points, axis=0)
        points_both.append(pts)
        labels_both.append(_point_labels(
            frame, range_images, segmentation_labels, ri_index))
    pts = np.concatenate(points_both, axis=0)
    labels = np.concatenate(labels_both, axis=0)
    return pts[:, 3:6], pts[:, 1], labels


def _point_labels(frame, range_images, segmentation_labels, ri_index):
    import tensorflow.compat.v1 as tf

    out = []
    for calib in sorted(frame.context.laser_calibrations, key=lambda c: c.name):
        ri = range_images[calib.name][ri_index]
        ri_tensor = tf.reshape(tf.convert_to_tensor(ri.data), ri.shape.dims)
        mask = ri_tensor[..., 0] > 0
        if calib.name in segmentation_labels:
            sl = segmentation_labels[calib.name][ri_index]
            sl_tensor = tf.reshape(tf.convert_to_tensor(sl.data), sl.shape.dims)
            picked = tf.gather_nd(sl_tensor, tf.where(mask)).numpy()
        else:
            n_valid = int(tf.reduce_sum(tf.cast(mask, tf.int32)))
            picked = np.zeros((n_valid, 2), np.int32)
        out.append(picked)
    return np.concatenate(out, axis=0)


def process_record(record_path, output_root):
    import tensorflow.compat.v1 as tf
    from waymo_open_dataset import dataset_pb2

    segment = os.path.basename(record_path).split(".")[0]
    split = os.path.basename(os.path.dirname(record_path))
    save_path = os.path.join(output_root, split, segment)
    count = 0
    for data in tf.data.TFRecordDataset(record_path, compression_type=""):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        if not frame.lasers[0].ri_return1.segmentation_label_compressed:
            continue  # only ~1/10 frames carry semseg labels
        coords, intensity, labels = _frame_points_and_labels(frame)
        write_frame(save_path, count, coords, intensity,
                    labels if split != "testing" else None)
        count += 1
    return save_path, count


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--splits", nargs="+", required=True,
                        choices=["training", "validation", "testing"])
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    records = [
        p for p in glob.glob(
            os.path.join(os.path.abspath(args.dataset_root), "*", "*.tfrecord"))
        if os.path.basename(os.path.dirname(p)) in args.splits
    ]
    for split in args.splits:
        os.makedirs(os.path.join(args.output_root, split), exist_ok=True)
    print(f"{len(records)} records")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for path, n in pool.map(process_record, records,
                                [args.output_root] * len(records)):
            print(f"{path}: {n} labeled frames")


if __name__ == "__main__":
    main()
