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

# the full PDF recognizer: PTRecognizer U-decoder + pseudo-labeling
# firing from start_epoch on (VERDICT r2 item 4a — previously only the
# MSP baseline was driven through the CLI)
CFG_PDF = CFG_OPENSEG.replace(
    'recognizer = dict(type="MaxProbability", method="msp")',
    """recognizer = dict(
    type="PointPdf-v1m1",
    recognizer=dict(type="PointTransformer-Recognizer"),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                   ignore_index=-1)],
    loss_weight=0.05,
    step_loss_weight=False,
    num_classes=4,
    # trainer epochs = epoch // (epoch // eval_epoch) = 4 here (the loop
    # fold); fire pseudo-labeling for the last two of them
    start_epoch=2,
    kp_ball_radius=0.5,
    kp_max_neighbor=8,
    condition_from="msp",
    beta=1.5,
    seed_from="ml",
    seed_range=0.1,
    num_seed=8,
    slide_window=True,
    pseudo_jobs=1,
)""")

CFG_INCR = CFG_COMMON + """
incr_resume = False
incr_ckpt = None
base_ckpt = None
load_base_weight_to_incr_learner = True
base_weight_process_func = "trim_base_weight_head"
unknown_label = [3]
incr_label_remap = dict([(3, 4)])
incr_label_select = [3]
incremental_learner = dict(
    type="PointPdf-incr-v1m1",
    backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                  num_classes=5),
    eval_criteria=[dict(type="CrossEntropyLoss", loss_weight=1,
                        ignore_index=-1)],
)
hooks = [
    dict(type="IncrSegCheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="IncrSegEvaluator"),
    dict(type="IncrSegCheckpointSaver"),
]
train = dict(type="IncrSegTrainer")
test = dict(type="IncrSegTester", verbose=True)
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


def _run_cli(script, config_path, extra_options=(), timeout=2400):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        # cheap-compile flags + a cache dir of their own — IN the repo
        # tree: /tmp is wiped between rounds, and a cold-cache CLI run
        # blows the per-test budget on this 1-core box
        JAX_DISABLE_MOST_OPTIMIZATIONS="1",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache_cli_tests"),
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
    if "incremental_learner" in template:
        label_tf = ('dict(type="RemapLabel", remap_dict=dict([(3, 4)]), '
                    "remap_select=[3]),\n        ")
        extra_keys = ', "segment_incr", "segment_incr_remap"'
    elif "unknown_label" in template:
        label_tf = 'dict(type="MaskLabel", mask_label=[3]),\n        '
        extra_keys = ', "segment_known"'
    else:
        label_tf, extra_keys = "", ""
    body = template.format(
        names=NAMES, data_root=synth_root,
        train_transform=_TRAIN_TRANSFORM.format(
            mask_label=label_tf, extra_keys=extra_keys),
    ) + f"\nsave_path = {save_path!r}\n"
    with open(cfg_path, "w") as f:
        f.write(body)
    return cfg_path, save_path


@pytest.fixture(scope="module")
def semseg_run(tmp_path_factory, synth_root):
    """Closed-set CLI training run, shared by the semseg assertion and
    (as the distillation base checkpoint) the incremental case."""
    tmp = tmp_path_factory.mktemp("semseg_cli")
    cfg_path, save_path = _write_cfg(tmp, CFG_SEMSEG, synth_root, "semseg")
    log = _run_cli("train.py", cfg_path)
    return cfg_path, save_path, log


def test_semseg_cli_convergence(semseg_run):
    cfg_path, save_path, log = semseg_run
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


def test_pointpdf_cli_convergence(tmp_path, synth_root):
    """The full PDF flow through the CLI (VERDICT r2 item 4a): PointPdf
    recognizer with the PTRecognizer U-decoder, pseudo-labeling active
    from start_epoch on — asserted to actually fire (non-trivial flag
    fraction in the step log) — and unknown scoring beating chance."""
    cfg_path, save_path = _write_cfg(tmp_path, CFG_PDF, synth_root, "pdf")
    log = _run_cli("train.py", cfg_path, timeout=2400)
    mious = _mious(log)
    assert mious and mious[-1] >= 0.6, f"pdf mIoU history {mious}"
    flagged = [float(m.group(1)) for m in re.finditer(
        r"pseudo_flagged: (\d\.\d+)", log)]
    assert flagged, f"pseudo-labeling never ran:\n{log[-3000:]}"
    assert max(flagged) > 0.0, "pseudo-labeling never flagged any point"

    best = os.path.join(save_path, "model", "model_best_auroc.pth")
    if not os.path.isfile(best):
        best = os.path.join(save_path, "model", "model_best_mIoU.pth")
    assert os.path.isfile(best)
    test_log = _run_cli("test.py", cfg_path, [f"weight={best}"])
    m = re.search(r"aupr/auroc (\d\.\d+)/(\d\.\d+)", test_log)
    assert m, f"tester produced no aupr/auroc:\n{test_log[-3000:]}"
    assert float(m.group(2)) > 0.5, f"PDF AUROC at chance: {m.group(2)}"


def test_incrseg_cli_convergence(tmp_path, synth_root, semseg_run):
    """Incremental distillation through the CLI (VERDICT r2 item 4b):
    the semseg run's best checkpoint becomes the frozen teacher; the
    student gains a class-4 head for remapped class 3.  Asserts the
    known/incr/remap metric triple is logged and remap mIoU converges."""
    _, semseg_save, _ = semseg_run
    base = os.path.join(semseg_save, "model", "model_best.pth")
    assert os.path.isfile(base)
    cfg_path, save_path = _write_cfg(tmp_path, CFG_INCR, synth_root, "incr")
    log = _run_cli("train.py", cfg_path, [f"base_ckpt={base}"],
                   timeout=2400)
    triples = {}
    for m in re.finditer(
            r"mIoU/mAcc/Acc (known|incr|remap) (\d\.\d+)", log):
        triples.setdefault(m.group(1), []).append(float(m.group(2)))
    assert set(triples) == {"known", "incr", "remap"}, (
        f"missing metric splits {triples.keys()}:\n{log[-3000:]}")
    assert triples["remap"][-1] >= 0.5, (
        f"incremental remap mIoU never converged: {triples['remap']}")
    # distillation must preserve the teacher's known classes
    assert triples["known"][-1] >= 0.6, (
        f"distillation forgot known classes: {triples['known']}")
