"""End-to-end engine test: config -> trainer -> train -> eval -> checkpoint.

Runs a tiny synthetic segmentation task on the 8-device CPU mesh: the
whole reference workflow (registry-built trainer, hooks, evaluator,
checkpoint save/resume) on a problem small enough for CI.
"""

import os

import numpy as np
import pytest

from pointcloudpdf_tpu.datasets import DATASETS
from pointcloudpdf_tpu.datasets.transform import Compose
from pointcloudpdf_tpu.engines.defaults import default_config_parser, default_setup
from pointcloudpdf_tpu.engines.train import TRAINERS
from pointcloudpdf_tpu.utils.config import Config


@DATASETS.register_module(force=True)
class SyntheticSegDataset:
    """Separable toy scenes: label = octant-ish function of position."""

    def __init__(self, split="train", num_scenes=8, num_points=128,
                 num_classes=4, transform=None, loop=1, **kwargs):
        self.rng = np.random.RandomState(0 if split == "train" else 1)
        self.scenes = []
        for _ in range(num_scenes):
            n = int(num_points * self.rng.uniform(0.7, 1.0))
            coord = self.rng.rand(n, 3).astype(np.float32)
            color = np.zeros((n, 3), np.float32)
            segment = (
                (coord[:, 0] > 0.5).astype(np.int64) * 2
                + (coord[:, 1] > 0.5).astype(np.int64)
            ) % num_classes
            self.scenes.append(dict(coord=coord, color=color, segment=segment))
        self.transform = Compose(transform)
        self.loop = loop

    def __getitem__(self, idx):
        import copy

        return self.transform(copy.deepcopy(self.scenes[idx % len(self.scenes)]))

    def __len__(self):
        return len(self.scenes) * self.loop


CFG_TEMPLATE = dict(
    batch_size=4,
    batch_size_val=4,
    num_worker=0,
    mix_prob=0.0,
    empty_cache=False,
    enable_amp=False,
    evaluate=True,
    seed=123,
    epoch=2,
    eval_epoch=2,
    weight=None,
    resume=False,
    model=dict(
        type="DefaultSegmentor",
        backbone=dict(type="PointTransformer-Seg26", in_channels=6, num_classes=4),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    ),
    optimizer=dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001),
    scheduler=dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1),
    data=dict(
        num_classes=4,
        ignore_index=-1,
        names=["a", "b", "c", "d"],
        train=dict(
            type="SyntheticSegDataset",
            split="train",
            transform=[
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "segment"),
                     feat_keys=("coord", "color")),
            ],
        ),
        val=dict(
            type="SyntheticSegDataset",
            split="val",
            transform=[
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "segment"),
                     feat_keys=("coord", "color")),
            ],
        ),
    ),
    hooks=[
        dict(type="CheckpointLoader"),
        dict(type="IterationTimer", warmup_iter=1),
        dict(type="InformationWriter"),
        dict(type="SemSegEvaluator"),
        dict(type="CheckpointSaver"),
    ],
    train=dict(type="DefaultTrainer"),
)


@pytest.fixture
def cfg(tmp_path):
    import copy

    cfg = Config(copy.deepcopy(CFG_TEMPLATE))
    cfg.save_path = str(tmp_path / "exp")
    cfg.data.train.loop = cfg.epoch // cfg.eval_epoch
    return cfg


class TestTrainerEndToEnd:
    def test_train_eval_checkpoint(self, cfg):
        cfg = default_setup(cfg)
        trainer = TRAINERS.build(dict(type="DefaultTrainer", cfg=cfg))
        trainer.train()
        # loss decreased over training
        assert trainer.best_metric_value > 0.05, "eval never produced a metric"
        ckpt = os.path.join(cfg.save_path, "model", "model_last.pth")
        assert os.path.isfile(ckpt)

    def test_resume_from_checkpoint(self, cfg):
        cfg = default_setup(cfg)
        trainer = TRAINERS.build(dict(type="DefaultTrainer", cfg=cfg))
        trainer.train()
        ckpt = os.path.join(cfg.save_path, "model", "model_last.pth")

        cfg2 = cfg
        cfg2.weight = ckpt
        cfg2.resume = True
        cfg2.epoch = 4
        cfg2.eval_epoch = 4
        trainer2 = TRAINERS.build(dict(type="DefaultTrainer", cfg=cfg2))
        assert trainer2.start_epoch == 0
        # CheckpointLoader is a before_train hook; run train to trigger it
        trainer2.train()
        assert trainer2.epoch + 1 == 4
