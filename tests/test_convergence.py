"""CLI convergence: tools/train.py + tools/test.py on synthetic data.

The reference validates its engine by running it (SURVEY.md §4.3); this
does the same through the *real CLI surface*: build a tiny separable
dataset on disk, train DefaultTrainer and OpenSegTrainer runs via
``tools/train.py`` subprocesses, assert the logged eval metrics reach a
threshold, then run ``tools/test.py`` fragment inference on the saved
best checkpoint and assert the tester reproduces it.

Serialized subprocesses on this 1-core box — the parent holds no device
work while a child runs.  Children get their own compile cache dir (they
run with different XLA flags than the in-process suite; mixed-flag cache
entries poison reads).
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = ["a", "b", "c", "d"]

_TRAIN_TRANSFORM = """[
        dict(type="NormalizeColor", mode="zeroOne"),
        {mask_label}dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "segment"{extra_keys}),
             feat_keys=("coord", "color")),
    ]"""

CFG_COMMON = """
weight = None
resume = False
evaluate = True
seed = 42
num_worker = 0
batch_size = 4
batch_size_val = 4
batch_size_test = 4
mix_prob = 0.0
empty_cache = False
enable_amp = False
sync_bn = True
find_unused_parameters = False
param_dicts = None
epoch = 40
eval_epoch = 4

optimizer = dict(type="AdamW", lr=0.02, weight_decay=0.01)
scheduler = dict(type="MultiStepLR", milestones=[0.8], gamma=0.1)

model = dict(
    type="DefaultSegmentor",
    backbone=dict(type="PointTransformer-Seg26", in_channels=6, num_classes=4),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

data = dict(
    num_classes=4,
    ignore_index=-1,
    names={names!r},
    train=dict(
        type="DefaultDataset",
        split="train",
        data_root={data_root!r},
        transform={train_transform},
        test_mode=False,
    ),
    val=dict(
        type="DefaultDataset",
        split="val",
        data_root={data_root!r},
        transform={train_transform},
        test_mode=False,
    ),
    test=dict(
        type="DefaultDataset",
        split="val",
        data_root={data_root!r},
        transform=[],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(
                type="GridSample", grid_size=0.005, hash_type="fnv",
                mode="test", keys=("coord", "color"),
                return_grid_coord=True,
            ),
            crop=None,
            post_transform=[
                dict(type="NormalizeColor", mode="zeroOne"),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "index"),
                     feat_keys=("coord", "color")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[1.0, 1.0])]],
        ),
    ),
)
"""

CFG_SEMSEG = CFG_COMMON + """
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
train = dict(type="DefaultTrainer")
test = dict(type="SemSegTester", verbose=True)
"""

CFG_OPENSEG = CFG_COMMON + """
unknown_label = [3]
recognizer = dict(type="MaxProbability", method="msp")
hooks = [
    dict(type="OpenSegCheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="OpenSegEvaluator"),
    dict(type="OpenSegCheckpointSaver", save_freq=None),
]
train = dict(type="OpenSegTrainer")
test = dict(type="OpenSegTester", verbose=True)
"""


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("convergence_ds")
    rng = np.random.RandomState(0)
    for split, n_scenes in (("train", 6), ("val", 2)):
        os.makedirs(root / split, exist_ok=True)
        for s in range(n_scenes):
            n = rng.randint(110, 128)
            coord = rng.rand(n, 3).astype(np.float32) * 2.0
            color = (rng.rand(n, 3) * 255).astype(np.float32)
            seg = ((coord[:, 0] > 1).astype(np.int64) * 2
                   + (coord[:, 1] > 1).astype(np.int64))
            np.savez(root / split / f"scene{s}.npz",
                     coord=coord, color=color, semantic_gt=seg)
    return str(root)


def _run_cli(script, config_path, extra_options=(), timeout=900):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        # cheap-compile flags + a cache dir of their own
        JAX_DISABLE_MOST_OPTIMIZATIONS="1",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cli_test_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )
    cmd = [sys.executable, os.path.join(REPO, "tools", script),
           "--config-file", config_path]
    if extra_options:
        cmd += ["--options", *extra_options]
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout + proc.stderr


def _mious(log_text):
    return [float(m.group(1)) for m in re.finditer(
        r"mIoU/mAcc/(?:allAcc|Acc)[^\d]*(\d\.\d+)", log_text)]


def _write_cfg(tmp_path, template, synth_root, name):
    cfg_path = str(tmp_path / f"{name}.py")
    save_path = str(tmp_path / f"exp_{name}")
    openseg = "unknown_label" in template
    body = template.format(
        names=NAMES, data_root=synth_root,
        train_transform=_TRAIN_TRANSFORM.format(
            mask_label='dict(type="MaskLabel", mask_label=[3]),\n        '
            if openseg else "",
            extra_keys=', "segment_known"' if openseg else ""),
    ) + f"\nsave_path = {save_path!r}\n"
    with open(cfg_path, "w") as f:
        f.write(body)
    return cfg_path, save_path


def test_semseg_cli_convergence(tmp_path, synth_root):
    cfg_path, save_path = _write_cfg(tmp_path, CFG_SEMSEG, synth_root, "semseg")
    log = _run_cli("train.py", cfg_path)
    mious = _mious(log)
    assert mious, f"no eval metrics logged:\n{log[-3000:]}"
    # separable 4-class toy: the final eval must largely solve it
    assert mious[-1] >= 0.7, f"train never converged: mIoU history {mious}"

    best = os.path.join(save_path, "model", "model_best.pth")
    assert os.path.isfile(best)
    test_log = _run_cli("test.py", cfg_path, [f"weight={best}"])
    test_mious = _mious(test_log)
    assert test_mious and test_mious[-1] >= 0.7, (
        f"tester disagreed with training eval: {test_mious}\n{test_log[-3000:]}"
    )


def test_openseg_cli_convergence(tmp_path, synth_root):
    cfg_path, save_path = _write_cfg(tmp_path, CFG_OPENSEG, synth_root,
                                     "openseg")
    log = _run_cli("train.py", cfg_path)
    mious = _mious(log)
    assert mious and mious[-1] >= 0.6, f"openseg mIoU history {mious}"
    # open-set metrics were produced and saved per-metric bests
    assert re.search(r"aupr", log), f"no open-set metrics:\n{log[-3000:]}"
    best = os.path.join(save_path, "model", "model_best_mIoU.pth")
    assert os.path.isfile(best)

    test_log = _run_cli("test.py", cfg_path, [f"weight={best}"])
    m = re.search(r"aupr/auroc (\d\.\d+)/(\d\.\d+)", test_log)
    assert m, f"tester produced no aupr/auroc:\n{test_log[-3000:]}"
    auroc = float(m.group(2))
    assert auroc > 0.5, f"unknown detection no better than chance: {auroc}"
