# ScanNetv2 PT-v2m2 hidden-test benchmark submission (reference
# configs/scannet/semseg-pt-v2m2-1-benchmark-submit.py): train on
# train+val, no evaluation, test split drives the submit writer.
_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=["train", "val"]),
    test=dict(split="test"),
)
