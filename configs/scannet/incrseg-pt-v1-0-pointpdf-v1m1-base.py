# ScanNetv2 incremental learning: distill a trained open-set PT-v1
# teacher into a student with two extra class logits
# (bathtub=18 -> 20, otherfurniture=19 -> 21).  BASELINE.json workload 5;
# mirrors the reference's S3DIS incrseg protocol
# (configs/s3dis/incrseg-pt-v1-0-pointpdf-v1m1-base.py) on ScanNet.
_base_ = ["../_base_/incrseg_runtime.py"]

batch_size = 16
mix_prob = 0.0
enable_amp = True

unknown_label = [18, 19]
incr_label_remap = {18: 20, 19: 21}
incr_label_select = [18, 19]

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="PointTransformer-Seg50",
        in_channels=6,
        num_classes=20,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

incremental_learner = dict(
    type="PointPdf-incr-v1m1",
    backbone=dict(
        type="PointTransformer-Seg50",
        in_channels=6,
        num_classes=20 + 2,
    ),
    eval_criteria=[dict(type="CrossEntropyLoss", loss_weight=1,
                        ignore_index=-1)],
)

epoch = 300
eval_epoch = 300
optimizer = dict(type="SGD", lr=0.5, momentum=0.9, weight_decay=0.0001)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)

dataset_type = "ScanNetDataset"
data_root = "data/scannet"

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
        type=dataset_type,
        split="train",
        data_root=data_root,
        transform=[
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.005),
            dict(type="HueSaturationTranslation", hue_max=0.5,
                 saturation_max=0.2),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", keys=("coord", "color", "segment"),
                 return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="ShufflePoint"),
            dict(type="PositiveShift"),
            dict(type="NormalizeColor", mode="zeroOne"),
            dict(type="RemapLabel", remap_dict=incr_label_remap,
                 remap_select=incr_label_select),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "segment_incr",
                       "segment_incr_remap"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        data_root=data_root,
        transform=[
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", keys=("coord", "color", "segment"),
                 return_grid_coord=True),
            dict(type="SphereCrop", point_max=800000, mode="center"),
            dict(type="PositiveShift"),
            dict(type="NormalizeColor", mode="zeroOne"),
            dict(type="RemapLabel", remap_dict=incr_label_remap,
                 remap_select=incr_label_select),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "segment_incr",
                       "segment_incr_remap"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
)
