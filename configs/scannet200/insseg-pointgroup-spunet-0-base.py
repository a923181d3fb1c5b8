# ScanNet200 instance segmentation: PointGroup over SpUNet (reference
# configs/scannet200/insseg-pointgroup-spunet-0-base.py).
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

from pointcloudpdf_tpu.datasets.scannet_constants import CLASS_LABELS_200

num_classes = 200
segment_ignore_index = (-1, 0, 2)

model = dict(
    semantic_num_classes=num_classes,
    segment_ignore_index=segment_ignore_index,
)

dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

data = dict(
    num_classes=num_classes,
    names=list(CLASS_LABELS_200),
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
