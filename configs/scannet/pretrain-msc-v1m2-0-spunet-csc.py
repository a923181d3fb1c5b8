# MSC v1m2: contrastive scene contexts partitioning (reference
# configs/scannet/pretrain-msc-v1m2-0-spunet-csc.py).
_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]

model = dict(
    type="MSC-v1m2",
    partitions=4,
    r1=0.125,
    r2=2,
)
