# PPT joint outdoor training validated on nuScenes (reference
# configs/nuscenes/semseg-ppt-v1m1-0-nu-sk-wa-spunet.py).
_base_ = ["../semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]

data = dict(
    num_classes=16,
    ignore_index=-1,
    names=[
        "barrier", "bicycle", "bus", "car", "construction_vehicle",
        "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
        "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
        "vegetation",
    ],
    val=dict(
        _delete_=True,
        type="NuScenesDataset",
        split="val",
        data_root="data/nuscenes",
        transform=[
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", return_grid_coord=True,
                 keys=("coord", "strength", "segment")),
            dict(type="PositiveShift"),
            dict(type="Add", keys_dict={"condition": "nuScenes"}),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "condition"),
                 feat_keys=("coord", "strength")),
        ],
        test_mode=False,
    ),
)
