# PPT v1m2 SemanticKITTI hidden-test submission (reference
# configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet-submit.py).
_base_ = ["./semseg-ppt-v1m2-0-sk-nu-wa-spunet.py"]

evaluate = False

data = dict(
    val=None,
    test=dict(
        type="SemanticKITTIDataset",
        split="test",
        data_root="data/semantic_kitti",
        transform=[
            dict(type="PointClip",
                 point_cloud_range=(-35.2, -35.2, -4, 35.2, 35.2, 2)),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", return_grid_coord=True,
                          keys=("coord", "strength")),
            crop=None,
            post_transform=[
                dict(type="PositiveShift"),
                dict(type="Add", keys_dict={"condition": "SemanticKITTI"}),
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
