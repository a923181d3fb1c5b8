# ScanNet200 PT-v3 fine-tune from a PPT joint pretrain (reference
# configs/scannet200/semseg-pt-v3m1-1-ppt-ft.py): base weights arrive
# via --options weight=..., loaded through the keyword-rewriting loader.
_base_ = ["./semseg-pt-v3m1-0-base.py"]

hooks = [
    dict(type="CheckpointLoader",
         keywords="module.backbone_module.", replacement="module."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
