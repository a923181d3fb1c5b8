# PTv3 + PPT "extreme" joint training, S3DIS-validated (reference
# configs/s3dis/semseg-pt-v3m1-1-ppt-extreme.py: PPT-v1m1 over a PDNorm
# PT-v3 backbone; 75.4 Area-5 mIoU baseline, README_Pointcept.md:560).
_base_ = ["./semseg-ppt-v1m1-0-s3-sc-st-spunet.py"]

batch_size = 24
mix_prob = 0.8
enable_amp = True

model = dict(
    _delete_=True,
    type="PPT-v1m1",
    backbone=dict(
        type="PT-v3m1",
        # dense indoor surface scans merge >=2 voxels per 2x stride:
        # halved per-level capacities are lossless and remove the
        # padded-buffer waste at the deep 512-ch stages
        level_capacity_factor=0.5,
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(1024, 1024, 1024, 1024),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        enable_rpe=False,
        enable_flash=True,
        cls_mode=False,
        pdnorm_bn=True,
        pdnorm_ln=True,
        pdnorm_decouple=True,
        pdnorm_adaptive=False,
        pdnorm_affine=True,
        pdnorm_conditions=("ScanNet", "S3DIS", "Structured3D"),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    backbone_out_channels=64,
    context_channels=256,
    conditions=("Structured3D", "ScanNet", "S3DIS"),
    template="[x]",
    clip_model="ViT-B/16",
    class_embedding_path=None,
)

epoch = 3000
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.005, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR",
    max_lr=[0.005, 0.0005],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0005)]
