# ScanNetv2 Stratified Transformer v1m2 refined (reference
# configs/scannet/semseg-st-v1m2-0-refined.py).
_base_ = ["./semseg-st-v1m1-0-origin.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ST-v1m2",
        in_channels=6,
        num_classes=20,
        channels=(48, 96, 192, 384, 384),
        num_heads=(6, 12, 24, 24),
        depths=(3, 9, 3, 3),
        window_size=(0.2, 0.4, 0.8, 1.6),
        quant_size=(0.01, 0.02, 0.04, 0.08),
        mlp_expend_ratio=4.0,
        down_ratio=0.25,
        down_num_sample=16,
        kp_ball_radius=2.5 * 0.02,
        kp_max_neighbor=34,
        kp_grid_size=0.02,
        kp_sigma=1.0,
        drop_path_rate=0.3,
        rel_query=True,
        rel_key=True,
        rel_value=True,
        qkv_bias=True,
        stem=True,
    ),
)
