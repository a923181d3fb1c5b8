# S3DIS open-set MSP baseline on the Stratified Transformer backbone
# (reference configs/s3dis/openseg-st-v1m1-0-origin-msp.py).
_base_ = ["./openseg-st-v1m1-0-origin-pointpdf-v1m1-base.py"]

recognizer = dict(
    _delete_=True,
    type="MaxProbability",
    method="msp",
)
