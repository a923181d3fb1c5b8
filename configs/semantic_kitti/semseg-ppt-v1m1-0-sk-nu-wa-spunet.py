# PPT joint outdoor training (SemanticKITTI + nuScenes + Waymo) over
# SpUNet-v1m3, validated on SemanticKITTI (reference
# configs/semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 12
mix_prob = 0.8
enable_amp = True

train = dict(type="MultiDatasetTrainer")

model = dict(
    type="PPT-v1m1",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4,
        num_classes=0,
        base_channels=32,
        context_channels=256,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        cls_mode=False,
        conditions=("SemanticKITTI", "nuScenes", "Waymo"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=False,
        norm_affine=True,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    template="[x]",
    clip_model="ViT-B/16",
    class_name=(
        # SemanticKITTI
        "car", "bicycle", "motorcycle", "truck", "other vehicle",
        "person", "person who rides a bicycle",
        "person who rides a motorcycle", "road", "parking",
        "path for pedestrians at the side of a road", "other ground",
        "building", "fence", "vegetation", "trunk", "terrain", "pole",
        "traffic sign",
        # nuScenes
        "barrier", "bicycle", "bus", "car", "construction vehicle",
        "motorcycle", "pedestrian", "traffic cone", "trailer", "truck",
        "path suitable or safe for driving", "other flat", "sidewalk",
        "terrain", "man made", "vegetation",
        # Waymo
        "car", "truck", "bus", "other vehicle",
        "person who rides a motorcycle", "person who rides a bicycle",
        "pedestrian", "sign", "traffic light", "pole", "construction cone",
        "bicycle", "motorcycle", "building", "vegetation", "tree trunk",
        "curb", "road", "lane marker", "other ground",
        "horizontal surface that can not drive",
        "surface when pedestrians most likely to walk on",
    ),
    valid_index=(
        tuple(range(19)),
        tuple(range(19, 19 + 16)),
        tuple(range(19 + 16, 19 + 16 + 22)),
    ),
    backbone_mode=False,
    class_embedding_path=None,
)

epoch = 50
eval_epoch = 50
optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.005)
scheduler = dict(
    type="OneCycleLR",
    max_lr=0.002,
    pct_start=0.04,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=100.0,
)

_sk_transform = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="PointClip",
         point_cloud_range=(-35.2, -35.2, -4, 35.2, 35.2, 2)),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "strength", "segment")),
    dict(type="SphereCrop", point_max=102400, mode="random"),
    dict(type="PositiveShift"),
    dict(type="Add", keys_dict={"condition": "SemanticKITTI"}),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("coord", "strength")),
]

_nu_transform = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "strength", "segment")),
    dict(type="SphereCrop", point_max=102400, mode="random"),
    dict(type="PositiveShift"),
    dict(type="Add", keys_dict={"condition": "nuScenes"}),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("coord", "strength")),
]

_wa_transform = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="PointClip",
         point_cloud_range=(-75.2, -75.2, -4, 75.2, 75.2, 2)),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "strength", "segment")),
    dict(type="SphereCrop", point_max=102400, mode="random"),
    dict(type="PositiveShift"),
    dict(type="Add", keys_dict={"condition": "Waymo"}),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("coord", "strength")),
]

data = dict(
    num_classes=19,
    ignore_index=-1,
    names=[
        "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
        "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
        "other-ground", "building", "fence", "vegetation", "trunk",
        "terrain", "pole", "traffic-sign",
    ],
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(type="NuScenesDataset", split="train",
                 data_root="data/nuscenes", transform=_nu_transform, loop=1),
            dict(type="SemanticKITTIDataset", split="train",
                 data_root="data/semantic_kitti", transform=_sk_transform,
                 loop=1),
            dict(type="WaymoDataset", split="training",
                 data_root="data/waymo", transform=_wa_transform, loop=1),
        ],
    ),
    val=dict(
        type="SemanticKITTIDataset",
        split="val",
        data_root="data/semantic_kitti",
        transform=[
            dict(type="PointClip",
                 point_cloud_range=(-35.2, -35.2, -4, 35.2, 35.2, 2)),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "strength", "segment")),
            dict(type="PositiveShift"),
            dict(type="Add", keys_dict={"condition": "SemanticKITTI"}),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "condition"),
                 feat_keys=("coord", "strength")),
        ],
        test_mode=False,
    ),
)
