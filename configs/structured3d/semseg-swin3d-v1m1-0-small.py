# Structured3D Swin3D small (reference
# configs/structured3d/semseg-swin3d-v1m1-0-small.py).
_base_ = ["../s3dis/semseg-swin3d-v1m1-0-small.py"]

model = dict(backbone=dict(num_classes=25))

epoch = 100
eval_epoch = 100

dataset_type = "Structured3DDataset"
data_root = "data/structured3d"

data = dict(
    num_classes=25,
    ignore_index=-1,
    names=[
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "picture", "desk", "shelves", "curtain", "dresser",
        "pillow", "mirror", "ceiling", "refrigerator", "television",
        "nightstand", "sink", "lamp", "otherstructure", "otherfurniture",
        "otherprop",
    ],
    train=dict(type=dataset_type, split="train", data_root=data_root),
    val=dict(type=dataset_type, split="val", data_root=data_root),
    test=dict(type=dataset_type, split="test", data_root=data_root),
)
