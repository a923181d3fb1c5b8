# PPT joint training (ScanNet + Structured3D + S3DIS) over SpUNet-v1m3
# (reference configs/scannet/semseg-ppt-v1m1-0-sc-st-spunet.py).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 12
mix_prob = 0.8
enable_amp = True

model = dict(
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
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("Structured3D", "ScanNet", "S3DIS"),
    template="[x]",
    clip_model="ViT-B/16",
    # optional: path to precomputed CLIP text features for the 36-class
    # union vocabulary (npy [36, 512]); trainable init otherwise
    class_embedding_path=None,
)

epoch = 100
eval_epoch = 100
optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="OneCycleLR", max_lr=0.05, pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=10000.0)

data_root_sc = "data/scannet"
data_root_st = "data/structured3d"
data_root_s3 = "data/s3dis"

_sc_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Add", keys_dict={"condition": "ScanNet"}),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"),
         feat_keys=("coord", "color")),
]

data = dict(
    num_classes=20,
    ignore_index=-1,
    names=[
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "bookshelf", "picture", "counter", "desk", "curtain",
        "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
        "otherfurniture",
    ],
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(
                type="Structured3DDataset",
                split="train",
                data_root=data_root_st,
                transform=[
                    dict(type="CenterShift", apply_z=True),
                    dict(type="RandomScale", scale=[0.9, 1.1]),
                    dict(type="RandomFlip", p=0.5),
                    dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                         mode="train", return_grid_coord=True),
                    dict(type="SphereCrop", point_max=100000, mode="random"),
                    dict(type="CenterShift", apply_z=False),
                    dict(type="NormalizeColor"),
                    dict(type="Add", keys_dict={"condition": "Structured3D"}),
                    dict(type="ToTensor"),
                    dict(type="Collect",
                         keys=("coord", "grid_coord", "segment", "condition"),
                         feat_keys=("coord", "color")),
                ],
                loop=2,
            ),
            dict(
                type="ScanNetDataset",
                split="train",
                data_root=data_root_sc,
                transform=_sc_transform,
                loop=1,
            ),
            dict(
                type="S3DISDataset",
                split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
                data_root=data_root_s3,
                transform=[
                    dict(type="CenterShift", apply_z=True),
                    dict(type="RandomScale", scale=[0.9, 1.1]),
                    dict(type="RandomFlip", p=0.5),
                    dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                         mode="train", return_grid_coord=True),
                    dict(type="SphereCrop", point_max=100000, mode="random"),
                    dict(type="CenterShift", apply_z=False),
                    dict(type="NormalizeColor"),
                    dict(type="Add", keys_dict={"condition": "S3DIS"}),
                    dict(type="ToTensor"),
                    dict(type="Collect",
                         keys=("coord", "grid_coord", "segment", "condition"),
                         feat_keys=("coord", "color")),
                ],
                loop=1,
            ),
        ],
    ),
    val=dict(
        type="ScanNetDataset",
        split="val",
        data_root=data_root_sc,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Add", keys_dict={"condition": "ScanNet"}),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "condition"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
)

train = dict(type="MultiDatasetTrainer")
