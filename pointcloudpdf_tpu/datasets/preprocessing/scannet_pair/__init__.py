"""ScanNet frame-pair extraction for contrastive pretraining.

Reference contract: pointcept/datasets/preprocessing/scannet/scannet_pair/
(reader.py, SensorData.py, point_cloud_extractor.py,
compute_full_overlapping.py, generage_list.py, preprocess.py) — parse
each scene's ``.sens`` stream, export every ``frame_skip``-th RGB-D
frame + pose, unproject to world-frame partial clouds, compute pairwise
overlap ratios, and list pairs with >=30% overlap.

This build keeps the same stage layout but is torch/open3d/cv2-free at
the geometry level: clouds are ``.npz`` (what ScanNetPairDataset loads),
overlap matching uses scipy cKDTree, and voxel downsampling is a numpy
grid hash.
"""

from .sensor_data import SensorData
from .extract_point_clouds import extract_scene_point_clouds
from .compute_overlap import compute_scene_overlap
from .generate_list import generate_overlap_list
from .preprocess import process_sens_file

__all__ = [
    "SensorData",
    "extract_scene_point_clouds",
    "compute_scene_overlap",
    "generate_overlap_list",
    "process_sens_file",
]
