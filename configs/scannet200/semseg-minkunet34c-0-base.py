# ScanNet200 MinkUNet34C (reference
# configs/scannet200/semseg-minkunet34c-0-base.py).
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(type="MinkUNet34C", in_channels=6, num_classes=200),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
