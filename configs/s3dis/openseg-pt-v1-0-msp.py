# S3DIS open-set MSP baseline: PT-v1 backbone, score = -max softmax prob.
# Parity target: reference configs/s3dis/openseg-pt-v1-*-msp config family
# (recognizer MaxProbability over the backbone seg_logits).
_base_ = ["./openseg-pt-v1-0-pointpdf-v1m1-base.py"]

recognizer = dict(
    _delete_=True,
    type="MaxProbability",
    method="msp",
)
