# ModelNet40 classification with SpUNet (cls_mode) — the reference's
# tracked ModelNet40 config (configs/modelnet40/cls-spunet-v1m1-0-base.py).
_base_ = ["./cls-pt-v1-0-base.py"]

model = dict(
    type="DefaultClassifier",
    num_classes=40,
    backbone_embed_dim=256,
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        cls_mode=True,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
