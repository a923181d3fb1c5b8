# ScanNet200 PT-v1 (reference configs/scannet200/semseg-pt-v1-0-base.py).
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="PointTransformer-Seg50",
        in_channels=6,
        num_classes=200,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 600
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
