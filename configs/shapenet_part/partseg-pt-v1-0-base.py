# ShapeNetPart part segmentation with PT-v1 (PartSeg50).
# The reference registers PointTransformer-PartSeg* backbones
# (point_transformer_partseg.py:353-369) without shipping a config; this
# config completes the workload with the standard ShapeNetPart recipe.
_base_ = ["../_base_/default_runtime.py"]

batch_size = 16
enable_amp = False

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="PointTransformer-PartSeg50",
        in_channels=6,
        num_classes=50,
        num_shape_classes=16,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 300
eval_epoch = 300
optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)

dataset_type = "ShapeNetPartDataset"
data_root = "data/shapenetcore_partanno_segmentation_benchmark_v0_normal"

_transform = [
    dict(type="NormalizeCoord"),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "segment", "category"),
         feat_keys=("coord", "normal")),
]

data = dict(
    num_classes=50,
    ignore_index=-1,
    names=[f"part_{i}" for i in range(50)],
    train=dict(type=dataset_type, split=["train", "val"],
               data_root=data_root, transform=_transform, test_mode=False),
    val=dict(type=dataset_type, split="test", data_root=data_root,
             transform=_transform, test_mode=False),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        transform=[dict(type="NormalizeCoord")],
        test_mode=True,
        test_cfg=dict(
            post_transform=[
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "index", "category"),
                     feat_keys=("coord", "normal")),
            ],
            aug_transform=[
                [dict(type="RandomScale", scale=[0.9, 0.9])],
                [dict(type="RandomScale", scale=[1, 1])],
                [dict(type="RandomScale", scale=[1.1, 1.1])],
            ],
        ),
    ),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

test = dict(type="PartSegTester")
