# ScanNet200 ST-v1m2 refined (reference
# configs/scannet200/semseg-st-v1m2-0-refined.py).
_base_ = ["../scannet/semseg-st-v1m2-0-refined.py"]

from pointcloudpdf_tpu.datasets.scannet_constants import CLASS_LABELS_200

model = dict(backbone=dict(num_classes=200))

dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

data = dict(
    num_classes=200,
    names=list(CLASS_LABELS_200),
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
