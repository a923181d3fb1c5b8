"""TPU end-to-end verification: train on the real chip, then prove the
TPU fragment tester matches the CPU tester bit-for-bit.

Why this exists: the pytest suite runs on CPU (`JAX_PLATFORMS=cpu`), so
the TPU-only fast paths — the fused/pruned Pallas kNN dispatch
(`ops/geometry.py`), the fused vector-attention kernel
(`ops/pallas_attention.py`), the fused ST window attention
(`ops/pallas_st_attention.py`) and the band KPConv stem
(`ops/pallas_kpconv.py`) — are exercised live only here and in
`bench.py`.  This script closes the loop the reference closes with its
released checkpoints (reference `README.md:256-259`): a model *trained*
through `tools/train.py` on the TPU is evaluated through
`tools/test.py`'s fragment+voting SemSegTester twice — once on the TPU
(Pallas paths live; val scenes are ~39k points so the pruned-kNN
fragment dispatch fires) and once on CPU (exact XLA paths) — and the
argmax predictions must agree >= --min-agreement (default 0.999;
measured 1.0000 with identical mIoU for both --model variants on this
box, round 3).

Run (takes ~15 min cold, ~6 min warm on this 1-core box; stages are
serialized because two JAX processes thrash here):

    python tools/verify_tpu_e2e.py              # PT-v1 flagship
    python tools/verify_tpu_e2e.py --model st   # PDF paper backbone
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/tpu_e2e"

MODELS = {
    # flagship: pruned Pallas kNN + fused vector attention live on TPU
    "ptv1": """dict(
    type="DefaultSegmentor",
    backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                  num_classes=4),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                   ignore_index=-1)],
)""",
    # the PDF paper backbone: fused Pallas window attention + two-pass
    # band KPConv stem live on TPU (reduced width for a fast proof)
    "st": """dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="ST-v1m1", downsample_scale=4, depths=[1, 1, 1],
        channels=[32, 64, 128], num_heads=[2, 4, 8],
        window_size=[0.1, 0.2, 0.4], up_k=3,
        grid_sizes=[0.02, 0.04, 0.08], quant_sizes=[0.005, 0.01, 0.02],
        rel_query=True, rel_key=True, rel_value=True, drop_path_rate=0.0,
        num_layers=3, num_classes=4, ratio=0.25, k=8,
        prev_grid_size=0.02, sigma=1.0, stem_transformer=False,
        kp_ball_radius=0.05, kp_max_neighbor=24,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                   ignore_index=-1)],
)""",
}

CFG_BODY = '''
weight = None
resume = False
evaluate = True
seed = 42
num_worker = 0
batch_size = 4
batch_size_val = 2
batch_size_test = 2
mix_prob = 0.0
empty_cache = False
enable_amp = False
sync_bn = True
find_unused_parameters = False
param_dicts = None
epoch = 2
eval_epoch = 2

optimizer = dict(type="AdamW", lr=0.02, weight_decay=0.01)
scheduler = dict(type="MultiStepLR", milestones=[0.8], gamma=0.1)

model = {model_cfg}

data = dict(
    num_classes=4,
    ignore_index=-1,
    names=["a", "b", "c", "d"],
    train=dict(
        type="DefaultDataset", split="train", data_root="{ds}",
        transform=[
            dict(type="NormalizeColor", mode="zeroOne"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "segment"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
    val=dict(
        type="DefaultDataset", split="val", data_root="{ds}",
        transform=[
            dict(type="NormalizeColor", mode="zeroOne"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "segment"),
                 feat_keys=("coord", "color")),
        ],
        test_mode=False,
    ),
    test=dict(
        type="DefaultDataset", split="val", data_root="{ds}",
        transform=[], test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.005, hash_type="fnv",
                          mode="test", keys=("coord", "color"),
                          return_grid_coord=True),
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

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
train = dict(type="DefaultTrainer")
test = dict(type="SemSegTester", verbose=True)
save_path = "{exp}"
'''


def make_dataset(ds_root: str) -> None:
    rng = np.random.RandomState(0)
    # train scenes small (fast steps); val scenes ~39k points so the
    # tester's fragments cross the Pallas-kNN dispatch threshold
    for split, n_scenes, lo, hi in (("train", 6, 1800, 2048),
                                    ("val", 2, 38000, 40000)):
        os.makedirs(os.path.join(ds_root, split), exist_ok=True)
        for s in range(n_scenes):
            n = rng.randint(lo, hi)
            coord = rng.rand(n, 3).astype(np.float32) * 2.0
            color = (rng.rand(n, 3) * 255).astype(np.float32)
            seg = ((coord[:, 0] > 1).astype(np.int64) * 2
                   + (coord[:, 1] > 1).astype(np.int64))
            np.savez(os.path.join(ds_root, split, f"scene{s}.npz"),
                     coord=coord, color=color, semantic_gt=seg)


def run(cmd, log, env_extra=None, timeout=3600):
    env = dict(os.environ)
    env.update(env_extra or {})
    with open(log, "w") as f:
        p = subprocess.run(cmd, cwd=ROOT, env=env, stdout=f,
                           stderr=subprocess.STDOUT, timeout=timeout)
    if p.returncode != 0:
        tail = open(log).read()[-3000:]
        raise RuntimeError(f"{' '.join(cmd)} failed (see {log}):\n{tail}")


def miou_of(log: str) -> float:
    txt = open(log).read()
    m = re.findall(r"Val result: mIoU/mAcc/allAcc ([0-9.]+)", txt)
    if not m:
        raise RuntimeError(f"no Val result in {log}")
    return float(m[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(MODELS), default="ptv1")
    ap.add_argument("--min-agreement", type=float, default=0.999)
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir instead of regenerating")
    args = ap.parse_args()

    work = f"/tmp/tpu_e2e_{args.model}" if args.model != "ptv1" \
        else "/tmp/tpu_e2e"
    global WORK
    WORK = work
    cfg_path = os.path.join(WORK, "semseg-tpu-e2e.py")
    if not args.keep and os.path.isdir(WORK):
        shutil.rmtree(WORK)
    ds = os.path.join(WORK, "ds")
    exp = os.path.join(WORK, "exp")
    if not os.path.isdir(ds):
        make_dataset(ds)
    with open(cfg_path, "w") as f:
        f.write(CFG_BODY.replace("{ds}", ds).replace("{exp}", exp)
                .replace("{model_cfg}", MODELS[args.model]))

    py = sys.executable
    print("[1/3] train 2 epochs on the default platform (TPU) ...")
    run([py, "tools/train.py", "--config-file", cfg_path],
        os.path.join(WORK, "train.log"))
    weight = os.path.join(exp, "model", "model_best.pth")

    print("[2/3] fragment tester on TPU (Pallas kNN + fused attention live) ...")
    run([py, "tools/test.py", "--config-file", cfg_path, "--options",
         f"weight={weight}", f"save_path={os.path.join(WORK, 'test_tpu')}"],
        os.path.join(WORK, "test_tpu.log"))

    print("[3/3] fragment tester on CPU (exact XLA paths) ...")
    run([py, "tools/test.py", "--config-file", cfg_path, "--options",
         f"weight={weight}", f"save_path={os.path.join(WORK, 'test_cpu')}"],
        os.path.join(WORK, "test_cpu.log"), env_extra={"JAX_PLATFORMS": "cpu"})

    miou_t = miou_of(os.path.join(WORK, "test_tpu.log"))
    miou_c = miou_of(os.path.join(WORK, "test_cpu.log"))
    agrees = []
    for s in ("scene0", "scene1"):
        a = np.load(os.path.join(WORK, "test_tpu", "result", f"{s}_pred.npy"))
        b = np.load(os.path.join(WORK, "test_cpu", "result", f"{s}_pred.npy"))
        agrees.append(float((a == b).mean()))
    agree = min(agrees)
    ok = agree >= args.min_agreement and abs(miou_t - miou_c) <= 0.005
    print(f"TPU mIoU {miou_t:.4f} | CPU mIoU {miou_c:.4f} | "
          f"min per-scene argmax agreement {agree:.4f} | "
          f"{'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
