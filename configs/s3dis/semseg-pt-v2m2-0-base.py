# S3DIS Area-5 closed-set with PT-v2 (grouped vector attention).
# Parity target: reference configs/s3dis/semseg-pt-v2m2-0-base.py.
_base_ = ["./semseg-pt-v1-0-base.py"]

batch_size = 12
mix_prob = 0.8
enable_amp = True

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        _delete_=True,
        type="PT-v2m2",
        # indoor scans merge >=4 children/parent at these grid
        # ratios: shrink per-level capacities (overflow sow-guarded)
        level_capacity_factor=0.5,
        in_channels=6,
        num_classes=13,
        patch_embed_depth=2,
        patch_embed_channels=48,
        patch_embed_groups=6,
        patch_embed_neighbours=16,
        enc_depths=(2, 6, 2),
        enc_channels=(96, 192, 384),
        enc_groups=(12, 24, 48),
        enc_neighbours=(16, 16, 16),
        dec_depths=(1, 1, 1),
        dec_channels=(48, 96, 192),
        dec_groups=(6, 12, 24),
        dec_neighbours=(16, 16, 16),
        grid_sizes=(0.1, 0.2, 0.4),
        attn_qkv_bias=True,
        pe_multiplier=False,
        pe_bias=True,
        attn_drop_rate=0.0,
        drop_path_rate=0.3,
        unpool_backend="map",
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 3000
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
