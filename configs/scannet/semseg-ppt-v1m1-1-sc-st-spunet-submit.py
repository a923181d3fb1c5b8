# PPT joint training, ScanNet hidden-test submission (reference
# configs/scannet/semseg-ppt-v1m1-1-sc-st-spunet-submit.py).
_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]

evaluate = False

data = dict(
    val=None,
    test=dict(
        type="ScanNetDataset",
        split="test",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "color")),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Add", keys_dict={"condition": "ScanNet"}),
                dict(type="ToTensor"),
                dict(type="Collect",
                     keys=("coord", "grid_coord", "index", "condition"),
                     feat_keys=("coord", "color")),
            ],
            aug_transform=[
                [dict(type="RandomScale", scale=[1, 1])],
            ],
        ),
    ),
)
