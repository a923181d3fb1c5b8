# ScanNetv2 instance segmentation: PointGroup over a PPT backbone
# fine-tune (reference
# configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py).
_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="PPT-v1m1",
        backbone=dict(
            type="SpUNet-v1m3",
            in_channels=6,
            num_classes=0,
            base_channels=32,
            context_channels=256,
            channels=(32, 64, 128, 256, 256, 128, 96, 96),
            layers=(2, 3, 4, 6, 2, 2, 2, 2),
            conditions=("ScanNet", "S3DIS", "Structured3D"),
            zero_init=False,
            norm_decouple=True,
            norm_adaptive=True,
            norm_affine=True,
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        backbone_out_channels=96,
        context_channels=256,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        backbone_mode=True,
    ),
)
