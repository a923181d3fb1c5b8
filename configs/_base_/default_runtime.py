# default runtime (parity with configs/_base_/default_runtime.py in the
# reference): training loop knobs, hooks, no parallelism config needed —
# data parallelism is automatic over the JAX device mesh.
weight = None  # path to checkpoint
resume = False
evaluate = True
test_only = False

seed = None
save_path = None
num_worker = 4
batch_size = 16
batch_size_val = None
batch_size_test = None
epoch = 100
eval_epoch = 100
sync_bn = True  # masked BN stats are globally reduced under GSPMD (always on)
enable_amp = False  # bf16 compute toggle
empty_cache = False
find_unused_parameters = False

mix_prob = 0
param_dicts = None

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

train = dict(type="DefaultTrainer")
test = dict(type="SemSegTester", verbose=True)
