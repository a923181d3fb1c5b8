# ScanNetv2 Swin3D small (reference
# configs/scannet/semseg-swin3d-v1m1-0-small.py).
_base_ = ["../s3dis/semseg-swin3d-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        num_classes=20,
        base_grid_size=0.02,
        down_stride=2,
    ),
)

epoch = 600
eval_epoch = 100

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
    train=dict(type=dataset_type, split="train", data_root=data_root),
    val=dict(type=dataset_type, split="val", data_root=data_root),
    test=dict(type=dataset_type, split="val", data_root=data_root),
)
