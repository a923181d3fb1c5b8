"""ScanNet v2 raw scans -> per-scene files with 20/200-class labels.

Reference contract: pointcept/datasets/preprocessing/scannet/
preprocess_scannet.py:122-185 — read ``<scene>_vh_clean_2.ply`` (+
``.labels.ply`` vertex labels via the label-mapping tsv, segment/
aggregation jsons for instances), emit coord/color/normal/
semantic_gt20/semantic_gt200/instance_gt per scene under
``<output>/<split>``.  Saves ``.npz``; vertex normals come from mesh
face accumulation (no open3d needed).

Usage:
    python -m pointcloudpdf_tpu.datasets.preprocessing.preprocess_scannet \
        --dataset_root data/raw/scannet --output_root data/scannet
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from ..scannet_constants import VALID_CLASS_IDS_20, VALID_CLASS_IDS_200

IGNORE = -1


def read_ply(path):
    from .ply_io import read_mesh

    coord, color, _, faces = read_mesh(path)
    color = (np.zeros((len(coord), 3), np.uint8) if color is None
             else color.astype(np.uint8))
    return coord, color, faces


def vertex_normals(coord, faces):
    if faces is None:
        return np.zeros_like(coord)
    tri = coord[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    normals = np.zeros_like(coord)
    for i in range(3):
        np.add.at(normals, faces[:, i], fn)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(norm, 1e-8)).astype(np.float32)


def load_label_map(tsv_path):
    """raw category name -> raw id (scannetv2-labels.combined.tsv); used
    to resolve aggregation-group labels into ScanNet200 train ids."""
    mapping = {}
    with open(tsv_path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            mapping[row["raw_category"]] = int(row["id"])
    return mapping


def process_scene(scene_dir, output_root, split, label_map):
    scene = os.path.basename(scene_dir.rstrip("/"))
    out_path = os.path.join(output_root, split, f"{scene}.npz")
    if os.path.isfile(out_path):
        return out_path
    mesh_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.ply")
    coord, color, faces = read_ply(mesh_path)
    normal = vertex_normals(coord, faces)
    n = len(coord)
    sem20 = np.full(n, IGNORE, np.int16)
    sem200 = np.full(n, IGNORE, np.int16)
    instance = np.full(n, IGNORE, np.int16)

    label_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.labels.ply")
    if os.path.isfile(label_path):
        from .ply_io import read_ply as read_ply_full

        labels = np.asarray(
            read_ply_full(label_path)["vertex"]["label"]
        ).astype(np.int64)
        lut20 = {cid: i for i, cid in enumerate(VALID_CLASS_IDS_20)}
        for cid, idx in lut20.items():
            sem20[labels == cid] = idx

    seg_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.0.010000.segs.json")
    agg_path = os.path.join(scene_dir, f"{scene}.aggregation.json")
    if os.path.isfile(seg_path) and os.path.isfile(agg_path):
        with open(seg_path) as f:
            seg_to_verts = np.asarray(json.load(f)["segIndices"])
        with open(agg_path) as f:
            groups = json.load(f)["segGroups"]
        lut200 = {cid: i for i, cid in enumerate(VALID_CLASS_IDS_200)}
        for inst_id, group in enumerate(groups):
            mask = np.isin(seg_to_verts, group["segments"])
            instance[mask] = inst_id
            # ScanNet200 ids come from the aggregation label via the
            # raw-category tsv (labels.ply only carries nyu40 ids)
            if label_map:
                raw_id = label_map.get(group.get("label", ""), None)
                if raw_id is not None and raw_id in lut200:
                    sem200[mask] = lut200[raw_id]

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(
        out_path, coord=coord, color=color, normal=normal,
        semantic_gt20=sem20, semantic_gt200=sem200, instance_gt=instance,
    )
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="dir containing scans/ scans_test/ and the "
                             "scannetv2-labels.combined.tsv")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    # look next to the raw scans first, then at the packaged benchmark
    # metadata (scannet_meta/, see its README)
    meta_dir = os.path.join(os.path.dirname(__file__), "scannet_meta")

    def _meta(name):
        local = os.path.join(args.dataset_root, name)
        return local if os.path.isfile(local) else os.path.join(meta_dir, name)

    tsv = _meta("scannetv2-labels.combined.tsv")
    label_map = load_label_map(tsv) if os.path.isfile(tsv) else None
    # official split lists if present, else everything under scans/
    for split, sub in (("train", "scans"), ("val", "scans"), ("test", "scans_test")):
        list_path = _meta(f"scannetv2_{split}.txt")
        scenes = []
        if os.path.isfile(list_path):
            scenes = [
                os.path.join(args.dataset_root, sub, s.strip())
                for s in open(list_path) if s.strip()
            ]
            # the packaged official list names scenes a custom raw dir may
            # not have — keep only those actually present
            if not list_path.startswith(args.dataset_root):
                scenes = [s for s in scenes if os.path.isdir(s)]
        if not scenes:
            if split == "train":
                scenes = sorted(
                    glob.glob(os.path.join(args.dataset_root, sub, "scene*")))
            else:
                continue
        print(f"{split}: {len(scenes)} scenes")
        with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
            for out in pool.map(
                process_scene, scenes, [args.output_root] * len(scenes),
                [split] * len(scenes), [label_map] * len(scenes),
            ):
                print("  wrote", out)


if __name__ == "__main__":
    main()
