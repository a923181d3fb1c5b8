# PPT joint training validated on S3DIS Area-5 (reference
# configs/s3dis/semseg-ppt-v1m1-0-s3-sc-st-spunet.py): same joint corpus
# as the ScanNet PPT config, S3DIS supervises eval.
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

epoch = 3000
eval_epoch = 100

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    val=dict(
        _delete_=True,
        type="S3DISDataset",
        split="Area_5",
        data_root="data/s3dis",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Add", keys_dict={"condition": "S3DIS"}),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "condition"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
)
