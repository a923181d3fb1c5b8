# ScanNetv2 open-set MaxLogit baseline (reference configs/scannet/openseg-pt-v1-0-ml.py).
_base_ = ["./openseg-pt-v1-0-pointpdf-v1m1-base.py"]

recognizer = dict(
    _delete_=True,
    type="MaxProbability",
    method="max_logits",
)
