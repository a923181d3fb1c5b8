# PPT v1m2 nuScenes hidden-test submission (reference
# configs/nuscenes/semseg-ppt-v1m2-1-nu-sk-wa-spunet-submit.py).
_base_ = ["./semseg-ppt-v1m2-0-nu-sk-wa-spunet.py"]

evaluate = False

data = dict(
    val=None,
    test=dict(
        type="NuScenesDataset",
        split="test",
        data_root="data/nuscenes",
        transform=[],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "strength")),
            crop=None,
            post_transform=[
                dict(type="PositiveShift"),
                dict(type="Add", keys_dict={"condition": "nuScenes"}),
                dict(type="ToTensor"),
                dict(type="Collect",
                     keys=("coord", "grid_coord", "index", "condition"),
                     feat_keys=("coord", "strength")),
            ],
            aug_transform=[
                [dict(type="RandomScale", scale=[1, 1])],
            ],
        ),
    ),
)
