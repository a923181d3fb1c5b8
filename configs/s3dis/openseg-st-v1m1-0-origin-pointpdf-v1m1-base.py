# S3DIS open-set PDF with the Stratified Transformer backbone
# (reference configs/s3dis/openseg-st-v1m1-0-origin-pointpdf-v1m1-base.py).
_base_ = ["./openseg-pt-v1-0-pointpdf-v1m1-base.py"]

mix_prob = 0

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        _delete_=True,
        type="ST-v1m1",
        downsample_scale=8,
        depths=[2, 2, 6, 2],
        channels=[48, 96, 192, 384],
        num_heads=[3, 6, 12, 24],
        window_size=[0.16, 0.32, 0.64, 1.28],
        up_k=3,
        grid_sizes=[0.04, 0.08, 0.16, 0.32],
        quant_sizes=[0.01, 0.02, 0.04, 0.08],
        rel_query=True,
        rel_key=True,
        rel_value=True,
        drop_path_rate=0.3,
        num_layers=4,
        concat_xyz=True,
        num_classes=13,
        ratio=0.25,
        k=16,
        prev_grid_size=0.04,
        sigma=1.0,
        stem_transformer=False,
        kp_ball_radius=0.04 * 2.5,
        kp_max_neighbor=34,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

recognizer = dict(
    _delete_=True,
    type="PointPdf-v1m1",
    recognizer=dict(
        type="ST-v1m1-Recognizer",
        up_k=3,
        channels=[48, 96, 192, 384],
        num_layers=4,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    loss_weight=0.01,
    step_loss_weight=False,
    num_classes=13,
    start_epoch=61,
    kp_ball_radius=0.04 * 2.5,
    kp_max_neighbor=34,
    condition_from="msp",
    beta=1.5,
    seed_from="ml",
    seed_range=0.01,
    num_seed=20,
    slide_window=True,
    adaptive_radius=False,
)

epoch = 3000
eval_epoch = 100
param_dicts = [dict(keyword="blocks", lr=0.006 * 0.1)]
optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="MultiStepWithWarmupLR",
    milestones=[0.6, 0.8],
    gamma=0.1,
    warmup_rate=0.05,
    warmup_scale=1e-6,
)
