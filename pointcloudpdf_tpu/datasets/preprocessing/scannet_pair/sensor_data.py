"""Parser for ScanNet's binary ``.sens`` RGB-D stream (format v4).

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
SensorData.py — the container holds sensor name, four 4x4 camera
matrices, per-stream compression tags, image sizes, a depth shift, and
``num_frames`` records of (camera_to_world 4x4 f32, two u64 timestamps,
two u64 payload sizes, color bytes, depth bytes).

This implementation reads each frame with two bulk ``f.read`` calls
instead of per-byte struct unpacking, decodes depth via zlib straight
into a uint16 grid, and decodes JPEG color through cv2 (gated import —
only needed when color is actually exported).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

COLOR_COMPRESSION = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
DEPTH_COMPRESSION = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort",
                     2: "occi_ushort"}


def _read_mat4(f):
    return np.frombuffer(f.read(64), dtype="<f4").reshape(4, 4).copy()


class Frame:
    __slots__ = ("camera_to_world", "timestamp_color", "timestamp_depth",
                 "color_bytes", "depth_bytes")

    def load(self, f):
        self.camera_to_world = _read_mat4(f)
        (self.timestamp_color, self.timestamp_depth,
         color_len, depth_len) = struct.unpack("<QQQQ", f.read(32))
        self.color_bytes = f.read(color_len)
        self.depth_bytes = f.read(depth_len)

    def depth_image(self, compression, height, width):
        if compression == "zlib_ushort":
            raw = zlib.decompress(self.depth_bytes)
        elif compression == "raw_ushort":
            raw = self.depth_bytes
        else:
            raise NotImplementedError(f"depth compression {compression}")
        return np.frombuffer(raw, dtype="<u2").reshape(height, width).copy()

    def color_image(self, compression):
        if compression != "jpeg":
            raise NotImplementedError(f"color compression {compression}")
        import cv2

        bgr = cv2.imdecode(np.frombuffer(self.color_bytes, np.uint8),
                           cv2.IMREAD_COLOR)
        return bgr[..., ::-1].copy()  # RGB


class SensorData:
    VERSION = 4

    def __init__(self, path):
        with open(path, "rb") as f:
            (version,) = struct.unpack("<I", f.read(4))
            if version != self.VERSION:
                raise ValueError(f".sens version {version} != {self.VERSION}")
            (name_len,) = struct.unpack("<Q", f.read(8))
            self.sensor_name = f.read(name_len).decode("ascii", "replace")
            self.intrinsic_color = _read_mat4(f)
            self.extrinsic_color = _read_mat4(f)
            self.intrinsic_depth = _read_mat4(f)
            self.extrinsic_depth = _read_mat4(f)
            color_tag, depth_tag = struct.unpack("<ii", f.read(8))
            self.color_compression = COLOR_COMPRESSION[color_tag]
            self.depth_compression = DEPTH_COMPRESSION[depth_tag]
            (self.color_width, self.color_height,
             self.depth_width, self.depth_height) = struct.unpack(
                "<IIII", f.read(16))
            (self.depth_shift,) = struct.unpack("<f", f.read(4))
            (num_frames,) = struct.unpack("<Q", f.read(8))
            self.frames = []
            for _ in range(num_frames):
                frame = Frame()
                frame.load(f)
                self.frames.append(frame)

    # -- exporters (reference SensorData.py:96-183 contract: one file per
    #    kept frame, named by its frame index) ---------------------------

    def _kept(self, frame_skip):
        return range(0, len(self.frames), max(1, frame_skip))

    def export_depth_images(self, output_path, frame_skip=1):
        os.makedirs(output_path, exist_ok=True)
        for i in self._kept(frame_skip):
            depth = self.frames[i].depth_image(
                self.depth_compression, self.depth_height, self.depth_width)
            np.save(os.path.join(output_path, f"{i}.npy"), depth)

    def export_color_images(self, output_path, frame_skip=1):
        os.makedirs(output_path, exist_ok=True)
        for i in self._kept(frame_skip):
            color = self.frames[i].color_image(self.color_compression)
            np.save(os.path.join(output_path, f"{i}.npy"), color)

    def export_poses(self, output_path, frame_skip=1):
        os.makedirs(output_path, exist_ok=True)
        for i in self._kept(frame_skip):
            np.savetxt(os.path.join(output_path, f"{i}.txt"),
                       self.frames[i].camera_to_world, fmt="%f")

    def export_intrinsics(self, output_path):
        os.makedirs(output_path, exist_ok=True)
        for name, mat in (
            ("intrinsic_color", self.intrinsic_color),
            ("extrinsic_color", self.extrinsic_color),
            ("intrinsic_depth", self.intrinsic_depth),
            ("extrinsic_depth", self.extrinsic_depth),
        ):
            np.savetxt(os.path.join(output_path, f"{name}.txt"), mat, fmt="%f")
