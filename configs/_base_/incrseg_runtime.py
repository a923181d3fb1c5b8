# incremental-learning runtime (parity with the reference
# configs/_base_/incrseg_runtime.py): teacher-student distillation with
# known/incr/remap best-metric tracking.
weight = None
base_ckpt = None
incr_ckpt = None
resume = False
incr_resume = False
load_base_weight_to_incr_learner = True
base_weight_process_func = "trim_base_weight_head"
evaluate = True
test_only = False

seed = 2024
save_path = None
num_worker = 4
batch_size = 16
batch_size_val = None
batch_size_test = None
epoch = 100
eval_epoch = 100

sync_bn = True
enable_amp = False
empty_cache = False
find_unused_parameters = False

mix_prob = 0
param_dicts = None

hooks = [
    dict(type="IncrSegCheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="IncrSegEvaluator"),
    dict(
        type="IncrSegCheckpointSaver",
        save_freq=5,
        tracked_best_metrics=["mIoU_known", "mIoU_incr", "mIoU_remap"],
        tracked_epoch=60,
    ),
]

train = dict(type="IncrSegTrainer")
test = dict(type="IncrSegTester", verbose=True)
