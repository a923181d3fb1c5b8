# PTv3 + PPT extreme joint training, ScanNet-validated (reference
# configs/scannet/semseg-pt-v3m1-1-ppt-extreme.py; 78.5 val mIoU
# baseline, README_Pointcept.md:556).
_base_ = ["../s3dis/semseg-pt-v3m1-1-ppt-extreme.py"]

data = dict(
    num_classes=20,
    ignore_index=-1,
    names=[
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "bookshelf", "picture", "counter", "desk", "curtain",
        "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
        "otherfurniture",
    ],
    val=dict(
        _delete_=True,
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
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
