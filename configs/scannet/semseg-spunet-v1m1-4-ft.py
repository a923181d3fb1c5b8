# SpUNet fine-tune from a pretrained checkpoint (reference
# configs/scannet/semseg-spunet-v1m1-4-ft.py): weight is supplied via
# --options weight=..., keywords strip the pretraining prefix.
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

epoch = 800
eval_epoch = 100

hooks = [
    dict(type="CheckpointLoader", keywords="module.", replacement="module."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
