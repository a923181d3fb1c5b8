# SemanticKITTI MinkUNet34C (reference
# configs/semantic_kitti/semseg-minkunet34c-0-base.py).
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(type="MinkUNet34C", in_channels=4, num_classes=19),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
