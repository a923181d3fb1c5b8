# ScanNetv2 open-set PDF with the Stratified Transformer backbone —
# the paper's headline configuration (AUPR 68.9 / AUROC 91.3 / mIoU 64.5,
# README.md:256-259).  Parity target: reference
# configs/scannet/openseg-st-v1m1-0-origin-pointpdf-v1m1-base.py.
_base_ = ["./openseg-pt-v1-0-pointpdf-v1m1-base.py"]

mix_prob = 0

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        _delete_=True,
        type="ST-v1m1",
        downsample_scale=4,
        depths=[3, 3, 9, 3, 3],
        channels=[48, 96, 192, 384, 384],
        num_heads=[3, 6, 12, 24, 24],
        window_size=[0.1, 0.2, 0.4, 0.8, 1.6],
        up_k=3,
        grid_sizes=[0.02, 0.04, 0.08, 0.16, 0.32],
        quant_sizes=[0.005, 0.01, 0.02, 0.04, 0.08],
        rel_query=True,
        rel_key=True,
        rel_value=True,
        drop_path_rate=0.3,
        num_layers=5,
        concat_xyz=True,
        num_classes=20,
        ratio=0.25,
        k=16,
        prev_grid_size=0.02,
        sigma=1.0,
        stem_transformer=False,
        kp_ball_radius=0.02 * 2.5,
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
        channels=[48, 96, 192, 384, 384],
        num_layers=5,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    loss_weight=0.008,
    step_loss_weight=False,
    num_classes=20,
    start_epoch=61,
    kp_ball_radius=0.02 * 5,
    kp_max_neighbor=64,
    condition_from="msp",
    beta=2,
    seed_from="ml",
    seed_range=0.15,
    num_seed=150,
    slide_window=True,
    adaptive_radius=False,
)

epoch = 600
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
