"""Preprocessing scripts driven on fabricated mini raw inputs end-to-end.

Each dataset's preprocessor runs against a tiny synthetic raw layout —
the reference's integration-by-running style (SURVEY.md §4.3) applied
to the data-preparation CLI surface.
"""

import json
import os
import struct
import zipfile
import zlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2", reason="image codec needed")


# ---------------------------------------------------------------- ply_io

def _write_mesh_ply(path, coord, color, faces, binary=True):
    header = (
        "ply\n"
        + ("format binary_little_endian 1.0\n" if binary else "format ascii 1.0\n")
        + f"element vertex {len(coord)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        + f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            for p, c in zip(coord, color):
                f.write(np.asarray(p, "<f4").tobytes())
                f.write(np.asarray(c, "u1").tobytes())
            for face in faces:
                f.write(struct.pack("<B", 3))
                f.write(np.asarray(face, "<i4").tobytes())
        else:
            for p, c in zip(coord, color):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n".encode())
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n".encode())


@pytest.mark.parametrize("binary", [True, False])
def test_ply_read_mesh(tmp_path, binary):
    from pointcloudpdf_tpu.datasets.preprocessing.ply_io import read_mesh

    coord = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    color = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    path = str(tmp_path / "mesh.ply")
    _write_mesh_ply(path, coord, color, faces, binary=binary)
    rcoord, rcolor, _, rfaces = read_mesh(path)
    np.testing.assert_allclose(rcoord, coord)
    np.testing.assert_array_equal(rcolor, color)
    np.testing.assert_array_equal(rfaces, faces)


def test_ply_reads_own_visualization_dump(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.ply_io import read_mesh
    from pointcloudpdf_tpu.utils.visualization import save_point_cloud

    coord = np.random.RandomState(0).rand(17, 3).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    save_point_cloud(coord, None, path)
    rcoord, rcolor, _, rfaces = read_mesh(path)
    np.testing.assert_allclose(rcoord, coord)
    assert rfaces is None and rcolor.shape == (17, 3)


# ------------------------------------------------------- scannet meshes

def test_preprocess_scannet_scene(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_scannet import (
        load_label_map, process_scene)

    scene_dir = tmp_path / "scans" / "scene0000_00"
    scene_dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    coord = rng.rand(30, 3).astype(np.float32)
    color = (rng.rand(30, 3) * 255).astype(np.uint8)
    faces = np.stack([np.arange(28), np.arange(1, 29), np.arange(2, 30)], 1)
    _write_mesh_ply(str(scene_dir / "scene0000_00_vh_clean_2.ply"),
                    coord, color, faces)

    # labels.ply: nyu40-style ids 1 (wall->train id 0) and 4 (bed)
    labels = np.where(np.arange(30) < 15, 1, 4).astype("<u2")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 30\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property ushort label\nend_header\n"
    )
    with open(scene_dir / "scene0000_00_vh_clean_2.labels.ply", "wb") as f:
        f.write(header.encode())
        rec = np.zeros(30, dtype=[("xyz", "<f4", 3), ("label", "<u2")])
        rec["xyz"] = coord
        rec["label"] = labels
        f.write(rec.tobytes())

    json.dump({"segIndices": (np.arange(30) // 10).tolist()},
              open(scene_dir / "scene0000_00_vh_clean_2.0.010000.segs.json", "w"))
    json.dump({"segGroups": [{"label": "wall", "segments": [0]},
                             {"label": "bed", "segments": [2]}]},
              open(scene_dir / "scene0000_00.aggregation.json", "w"))
    tsv = tmp_path / "labels.tsv"
    tsv.write_text("raw_category\tid\nwall\t1\nbed\t4\n")

    out = process_scene(str(scene_dir), str(tmp_path / "out"), "train",
                        load_label_map(str(tsv)))
    data = np.load(out)
    assert set(data.files) >= {"coord", "color", "normal", "semantic_gt20",
                               "semantic_gt200", "instance_gt"}
    assert (data["semantic_gt20"][:15] == 0).all()  # wall
    assert (data["semantic_gt20"][15:] == 3).all()  # bed
    assert (data["instance_gt"][:10] == 0).all()
    assert np.allclose(np.linalg.norm(data["normal"], axis=1), 1.0, atol=1e-5)


def test_preprocess_arkitscenes(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_arkitscenes_mesh import (
        parse_scene)

    mesh_dir = tmp_path / "3dod" / "Training" / "41048190"
    mesh_dir.mkdir(parents=True)
    coord = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    color = np.full((3, 3), 128, np.uint8)
    _write_mesh_ply(str(mesh_dir / "41048190_3dod_mesh.ply"), coord, color,
                    np.array([[0, 1, 2]]))
    out = parse_scene(str(mesh_dir / "41048190_3dod_mesh.ply"),
                      str(tmp_path / "out"))
    data = np.load(out)
    assert out.endswith(os.path.join("Training", "41048190.npz"))
    # single upward-facing triangle -> +z normals at every vertex
    np.testing.assert_allclose(data["normal"], [[0, 0, 1]] * 3, atol=1e-6)


# --------------------------------------------------------- structured3d

def _png16(arr):
    ok, buf = cv2.imencode(".png", arr.astype(np.uint16))
    assert ok
    return buf.tobytes()


def _png8(arr):
    ok, buf = cv2.imencode(".png", arr.astype(np.uint8))
    assert ok
    return buf.tobytes()


def test_preprocess_structured3d(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_structured3d import (
        parse_scene, scene_split)

    assert scene_split("scene_00001") == "train"
    assert scene_split("scene_03100") == "val"
    assert scene_split("scene_03400") == "test"

    h, w = 16, 32
    depth = np.full((h, w), 2000, np.uint16)  # 2 m everywhere
    color = np.full((h, w, 3), 90, np.uint8)
    semantic = np.full((h, w), 1, np.uint16)  # raw id 1 = wall -> train id 0

    zf_path = tmp_path / "Structured3D_00.zip"
    with zipfile.ZipFile(zf_path, "w") as zf:
        pano = "Structured3D/scene_00001/2D_rendering/42/panorama"
        zf.writestr(f"{pano}/camera_xyz.txt", "0 0 1600")
        zf.writestr(f"{pano}/full/depth.png", _png16(depth))
        zf.writestr(f"{pano}/full/rgb_rawlight.png", _png8(color))
        zf.writestr(f"{pano}/full/semantic.png", _png16(semantic))
        prsp = "Structured3D/scene_00001/2D_rendering/42/perspective/full/0"
        zf.writestr(f"{prsp}/camera_pose.txt",
                    "0 0 1600 1 0 0 0 0 1 0.5 0.4")
        zf.writestr(f"{prsp}/depth.png", _png16(depth))
        zf.writestr(f"{prsp}/rgb_rawlight.png", _png8(color))
        zf.writestr(f"{prsp}/semantic.png", _png16(semantic))

    outs = parse_scene("scene_00001", str(tmp_path), str(tmp_path / "out"))
    assert len(outs) == 1 and outs[0].endswith("room_42.npz")
    data = np.load(outs[0])
    assert data["coord"].shape[0] > 0
    assert np.isfinite(data["coord"]).all()
    assert (data["semantic_gt"] == 0).all()
    # fused cloud stays within ~depth-range of the 1.6 m-high camera
    assert np.abs(data["coord"]).max() < 5.0
    lengths = np.linalg.norm(data["normal"], axis=1)
    assert np.all(lengths < 1.0 + 1e-4)


# --------------------------------------------------------- scannet_pair

def _make_sens(path, poses, depth_maps, color_imgs, intrinsic):
    """Assemble a v4 .sens container around the given frames."""
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"fabricated"
        f.write(struct.pack("<Q", len(name)) + name)
        for mat in (intrinsic, np.eye(4), intrinsic, np.eye(4)):
            f.write(np.asarray(mat, "<f4").tobytes())
        f.write(struct.pack("<ii", 2, 1))  # jpeg color, zlib_ushort depth
        h, w = depth_maps[0].shape
        ch, cw = color_imgs[0].shape[:2]
        f.write(struct.pack("<IIII", cw, ch, w, h))
        f.write(struct.pack("<f", 1000.0))
        f.write(struct.pack("<Q", len(poses)))
        for pose, depth, color in zip(poses, depth_maps, color_imgs):
            f.write(np.asarray(pose, "<f4").tobytes())
            ok, jpg = cv2.imencode(".jpg", np.ascontiguousarray(color[..., ::-1]))
            assert ok
            depth_z = zlib.compress(depth.astype("<u2").tobytes())
            f.write(struct.pack("<QQQQ", 0, 0, len(jpg), len(depth_z)))
            f.write(jpg.tobytes())
            f.write(depth_z)


def test_scannet_pair_pipeline(tmp_path):
    pytest.importorskip("scipy")
    from pointcloudpdf_tpu.datasets.preprocessing.scannet_pair import (
        generate_overlap_list, process_sens_file)

    h, w = 24, 32
    intrinsic = np.eye(4)
    intrinsic[0, 0] = intrinsic[1, 1] = 20.0
    intrinsic[0, 2], intrinsic[1, 2] = w / 2, h / 2
    depth = np.full((h, w), 1500, np.uint16)
    color = np.full((h, w, 3), 200, np.uint8)
    shifted = np.eye(4)
    shifted[0, 3] = 0.05  # 5 cm apart -> high overlap
    far = np.eye(4)
    far[0, 3] = 50.0  # 50 m apart -> zero overlap

    scans = tmp_path / "scans" / "scene0001_00"
    scans.mkdir(parents=True)
    sens = scans / "scene0001_00.sens"
    _make_sens(str(sens), [np.eye(4), shifted, far],
               [depth] * 3, [color] * 3, intrinsic)

    out_root = tmp_path / "pairs"
    scene_dir = process_sens_file(str(sens), str(out_root), frame_skip=1)

    pcds = sorted(os.listdir(os.path.join(scene_dir, "pcd")))
    assert "overlap.txt" in pcds and len(pcds) == 4  # 3 clouds + table
    cloud = np.load(os.path.join(scene_dir, "pcd", "0.npz"))
    assert cloud["coord"].shape == (h * w, 3)
    assert np.allclose(cloud["coord"][:, 2], 1.5, atol=1e-5)

    rows = {}
    for line in open(os.path.join(scene_dir, "pcd", "overlap.txt")):
        a, b, ratio = line.split()
        rows[(os.path.basename(a), os.path.basename(b))] = float(ratio)
    assert rows[("0.npz", "1.npz")] > 0.5   # near-identical frames
    assert rows[("0.npz", "2.npz")] == 0.0  # far-apart frames

    list_path, kept = generate_overlap_list(str(out_root))
    assert kept == 1 and os.path.isfile(list_path)

    # the pair dataset consumes the produced layout directly
    from pointcloudpdf_tpu.datasets.scannet_pair import ScanNetPairDataset

    ds = ScanNetPairDataset(data_root=str(out_root))
    assert len(ds.data_list) == 1


# ------------------------------------------------------------- nuscenes

def _nuscenes_tables(root, n_sweeps=3):
    version_dir = os.path.join(root, "v1.0-trainval")
    os.makedirs(version_dir, exist_ok=True)
    ident = [1.0, 0.0, 0.0, 0.0]
    sds = []
    # prev-chain: sweep0 <- sweep1 <- keyframe
    for i in range(n_sweeps):
        sds.append({
            "token": f"sd{i}",
            "sample_token": "samp0",
            "ego_pose_token": f"pose{i}",
            "calibrated_sensor_token": "cs0",
            "filename": (f"samples/LIDAR_TOP/kf.pcd.bin" if i == n_sweeps - 1
                         else f"sweeps/LIDAR_TOP/s{i}.pcd.bin"),
            "is_key_frame": i == n_sweeps - 1,
            "timestamp": 1_000_000 * (i + 1),
            "prev": f"sd{i - 1}" if i > 0 else "",
            "next": f"sd{i + 1}" if i < n_sweeps - 1 else "",
        })
    tables = {
        "scene": [{"token": "scene0", "name": "scene-0001",
                   "first_sample_token": "samp0"}],
        "sample": [{"token": "samp0", "scene_token": "scene0", "next": "",
                    "prev": ""}],
        "sample_data": sds,
        "ego_pose": [{"token": f"pose{i}",
                      "translation": [float(i), 0.0, 0.0],
                      "rotation": ident} for i in range(n_sweeps)],
        "calibrated_sensor": [{"token": "cs0",
                               "translation": [0.0, 0.0, 1.8],
                               "rotation": ident}],
        "sensor": [{"token": "sens0", "channel": "LIDAR_TOP"}],
        "lidarseg": [{"token": "seg0", "sample_data_token": f"sd{n_sweeps-1}",
                      "filename": "lidarseg/v1.0-trainval/kf.bin"}],
        "sample_annotation": [{
            "token": "ann0", "sample_token": "samp0",
            "translation": [5.0, 0.0, 1.0], "size": [1.0, 2.0, 1.5],
            "rotation": ident, "num_lidar_pts": 7, "num_radar_pts": 0,
            "category_token": "cat0",
        }],
        "category": [{"token": "cat0", "name": "vehicle.car"}],
    }
    for name, rows in tables.items():
        json.dump(rows, open(os.path.join(version_dir, f"{name}.json"), "w"))
    json.dump({"train": ["scene-0001"]},
              open(os.path.join(version_dir, "splits.json"), "w"))


def test_nuscenes_info_builder(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_nuscenes_info import (
        build_infos, quaternion_to_rotation, transform_matrix)

    # quaternion for 90deg about z: x-axis -> y-axis
    rot = quaternion_to_rotation([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(rot @ [1, 0, 0], [0, 1, 0], atol=1e-7)
    tm = transform_matrix([1.0, 2.0, 3.0], [1, 0, 0, 0], inverse=True)
    np.testing.assert_allclose(tm @ [1.0, 2.0, 3.0, 1.0], [0, 0, 0, 1],
                               atol=1e-12)

    _nuscenes_tables(str(tmp_path))
    infos = build_infos(str(tmp_path), max_sweeps=3)
    assert len(infos["train"]) == 1 and len(infos["val"]) == 0
    info = infos["train"][0]
    # the contract NuScenesDataset reads (datasets/nuscenes.py)
    assert info["lidar_path"] == "samples/LIDAR_TOP/kf.pcd.bin"
    assert info["lidar_token"] == "sd2"
    assert info["gt_segment_path"] == "lidarseg/v1.0-trainval/kf.bin"
    assert len(info["sweeps"]) == 2
    # keyframe ego at x=2, sweep sd1 ego at x=1, identical sensor mount:
    # the sweep->ref transform is a -1 m x-shift
    tm = info["sweeps"][0]["transform_matrix"]
    np.testing.assert_allclose(tm[:3, 3], [-1.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(tm[:3, :3], np.eye(3), atol=1e-12)
    assert info["gt_names"][0] == "vehicle.car"
    assert info["gt_boxes"].shape == (1, 9)
    # box center: global (5,0,1) -> ego x-2 -> sensor z-1.8
    np.testing.assert_allclose(info["gt_boxes"][0, :3], [3.0, 0.0, -0.8],
                               atol=1e-9)


# ---------------------------------------------------------------- waymo

def test_waymo_frame_writer(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_waymo import (
        frame_index_name, write_frame)

    assert frame_index_name(7) == "000007"
    rng = np.random.RandomState(2)
    xyz = rng.rand(11, 3).astype(np.float32)
    intensity = rng.rand(11).astype(np.float32)
    labels = np.stack([np.arange(11), np.arange(11) % 5 + 1], 1)
    save = str(tmp_path / "training" / "segment-001")
    write_frame(save, 0, xyz, intensity, labels)

    # WaymoDataset's exact read convention (datasets/waymo.py:38-43)
    scan = np.fromfile(os.path.join(save, "velodyne", "000000.bin"),
                       dtype=np.float32).reshape(-1, 4)
    np.testing.assert_allclose(scan[:, :3], xyz)
    np.testing.assert_allclose(scan[:, 3], intensity)
    seg = np.fromfile(os.path.join(save, "labels", "000000.label"),
                      dtype=np.int32).reshape(-1, 2)[:, 1] - 1
    np.testing.assert_array_equal(seg, labels[:, 1] - 1)


def test_preprocess_s3dis_voxelized(tmp_path):
    from pointcloudpdf_tpu.datasets.preprocessing.preprocess_s3dis_voxelized import (
        voxelize_room)

    rng = np.random.RandomState(0)
    # two points per 1cm voxel + one lone voxel; voxel-center anchors so
    # the +1mm twin never crosses a boundary
    cells = np.stack(np.unravel_index(
        rng.choice(100 ** 3, 40, replace=False), (100, 100, 100)), 1)
    base = ((cells + 0.5) / 100.0).astype(np.float32)
    coord = np.concatenate([base, base + 0.001, [[9.0, 9.0, 9.0]]])
    room = dict(
        coord=coord,
        color=rng.randint(0, 255, (81, 3)).astype(np.uint8),
        semantic_gt=rng.randint(0, 13, (81,)).astype(np.int64),
        instance_gt=rng.randint(0, 5, (81,)).astype(np.int64),
    )
    src = tmp_path / "in" / "Area_1"
    src.mkdir(parents=True)
    np.savez(src / "office_1.npz", **room)

    out = voxelize_room(str(src / "office_1.npz"), str(tmp_path / "in"),
                        str(tmp_path / "out"), 0.01)
    assert out.endswith(os.path.join("Area_1", "office_1.npz"))
    data = np.load(out)
    # every duplicate pair collapses to one pick; the lone voxel survives
    assert data["coord"].shape == (41, 3)
    assert set(data.files) >= {"coord", "color", "semantic_gt", "instance_gt"}
    # picked rows keep their original attribute alignment
    full = {tuple(np.round(c, 4)): s
            for c, s in zip(coord, room["semantic_gt"])}
    for c, s in zip(data["coord"], data["semantic_gt"]):
        assert full[tuple(np.round(c, 4))] == s
