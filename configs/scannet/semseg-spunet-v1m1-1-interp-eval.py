# SpUNet with full-resolution "Interp." evaluation (reference
# configs/scannet/semseg-spunet-v1m1-1-interp-eval.py): the val split
# keeps origin_coord/origin_segment and the evaluator re-projects
# voxel predictions with a 1-NN lookup.
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

batch_size_val = 1

data = dict(
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy",
                 keys_dict={"coord": "origin_coord",
                            "segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "origin_coord", "segment",
                       "origin_segment"),
                 feat_keys=("color", "normal")),
        ],
    ),
)
