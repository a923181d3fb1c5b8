# open-set runtime (parity with the reference configs/_base_/openseg_runtime.py):
# open-set training wires the OpenSeg trainer/evaluator/checkpoint hooks and
# tracks a [mIoU, aupr, auroc] best-metric triple.
weight = None
resume = False
evaluate = True
test_only = False
eval_only = False

seed = 2024
save_path = None
num_worker = 4
batch_size = 16
batch_size_val = None
batch_size_test = None
epoch = 100
eval_epoch = 100

sync_bn = True  # masked BN stats sync automatically under GSPMD
enable_amp = False
empty_cache = False
find_unused_parameters = False

mix_prob = 0
param_dicts = None

hooks = [
    dict(type="OpenSegCheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="OpenSegEvaluator"),
    dict(type="OpenSegCheckpointSaver", save_freq=5),
]

train = dict(type="OpenSegTrainer")
test = dict(type="OpenSegTester", verbose=True)
