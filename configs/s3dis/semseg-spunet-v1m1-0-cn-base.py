# S3DIS SpUNet with coord+normal features only (reference
# configs/s3dis/semseg-spunet-v1m1-0-cn-base.py).
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(in_channels=6))
# feature set swaps color for coord+normal in the Collect keys; the
# reference keeps 6 channels (coord, normal)
data = dict(
    train=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train",
                 keys=("coord", "color", "normal", "segment"),
                 return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ShufflePoint"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "normal")),
        ],
    ),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy",
                 keys_dict={"coord": "origin_coord",
                            "segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train",
                 keys=("coord", "color", "normal", "segment"),
                 return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "origin_coord", "segment",
                       "origin_segment"),
                 feat_keys=("coord", "normal")),
        ],
    ),
    test=dict(
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", keys=("coord", "color", "normal"),
                          return_grid_coord=True),
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("coord", "normal")),
            ],
        ),
    ),
)
