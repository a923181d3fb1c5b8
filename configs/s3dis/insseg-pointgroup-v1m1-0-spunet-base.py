# S3DIS instance segmentation: PointGroup over SpUNet (reference
# configs/s3dis/insseg-pointgroup-v1m1-0-spunet-base.py; grid 0.04).
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

segment_ignore_index = (-1,)

model = dict(
    semantic_num_classes=13,
    segment_ignore_index=segment_ignore_index,
    cluster_thresh=1.5,
    cluster_closed_points=300,
    cluster_propose_points=100,
    cluster_min_points=50,
)

epoch = 3000
eval_epoch = 100

dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    train=dict(
        type=dataset_type,
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root=data_root,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2,
                 dropout_application_ratio=0.5),
            dict(type="RandomRotate", angle=[-1, 1], axis="z",
                 center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.04, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "color", "normal", "segment", "instance")),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=(-1,),
                 instance_ignore_index=-1),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance",
                       "instance_centroid"),
                 feat_keys=("color", "normal")),
        ],
    ),
    val=dict(
        type=dataset_type,
        split="Area_5",
        data_root=data_root,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.04, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "color", "normal", "segment", "instance")),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=(-1,),
                 instance_ignore_index=-1),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance",
                       "instance_centroid", "bbox"),
                 feat_keys=("color", "normal")),
        ],
    ),
    test=dict(
        type=dataset_type,
        split="Area_5",
        data_root=data_root,
    ),
)
