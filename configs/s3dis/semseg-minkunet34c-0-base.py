# S3DIS MinkUNet34C (reference configs/s3dis/semseg-minkunet34c-0-base.py).
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(type="MinkUNet34C", in_channels=6, num_classes=13),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
