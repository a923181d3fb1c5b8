# MSC ablation: PointContrast-style InfoNCE only (reference
# configs/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast.py — no view
# masking, no reconstruction heads).
_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]

model = dict(
    mask_rate=0.0,
    reconstruct_color=False,
    reconstruct_normal=False,
)
