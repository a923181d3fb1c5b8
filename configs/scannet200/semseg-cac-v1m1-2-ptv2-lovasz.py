# ScanNet200 CAC over PT-v2 + Lovasz (reference
# configs/scannet200/semseg-cac-v1m1-2-ptv2-lovasz.py).
_base_ = ["../scannet/semseg-cac-v1m1-2-ptv2-lovasz.py"]

from pointcloudpdf_tpu.datasets.scannet_constants import CLASS_LABELS_200

model = dict(num_classes=200)

dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

data = dict(
    num_classes=200,
    names=list(CLASS_LABELS_200),
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
