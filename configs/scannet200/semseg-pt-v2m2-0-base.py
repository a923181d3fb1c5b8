# ScanNet200 PT-v2m2 (reference configs/scannet200/semseg-pt-v2m2-0-base.py).
_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]

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
