"""Open-set (PDF) stack tests: recognizers, pseudo-labeling, trainer.

Mirrors the reference's integration-by-running strategy (SURVEY.md §4) at
unit scale: the pseudo-labeling graph pipeline gets a synthetic scene with
a known low-confidence cluster; the OpenSegTrainer runs a tiny epoch on
the 8-device CPU mesh with both the MSP baseline and the full PointPdf
recognizer.
"""

import numpy as np
import pytest

from pointcloudpdf_tpu.datasets import DATASETS
from pointcloudpdf_tpu.datasets.transform import Compose
from pointcloudpdf_tpu.engines.defaults import default_setup
from pointcloudpdf_tpu.engines.train import TRAINERS
from pointcloudpdf_tpu.recognizers import build_recognizer
from pointcloudpdf_tpu.recognizers.pseudo_label import pseudo_labeling
from pointcloudpdf_tpu.utils.config import Config


class TestPseudoLabeling:
    def make_scene(self, n=400, n_unknown=80, seed=0):
        """Scene with a spatially-tight, low-confidence corner cluster."""
        rng = np.random.RandomState(seed)
        coord = rng.rand(n, 3).astype(np.float32) * 4.0
        coord[:n_unknown] = rng.rand(n_unknown, 3) * 0.7  # tight cluster
        logits = np.zeros((n, 4), np.float32)
        known_cls = rng.randint(0, 4, n)
        logits[np.arange(n), known_cls] = 8.0  # confident knowns
        logits[:n_unknown] = rng.randn(n_unknown, 4) * 0.3  # uncertain
        return coord, logits

    def neighbors_of(self, coord, radius=0.6, k=16):
        d = np.linalg.norm(coord[:, None] - coord[None, :], axis=-1)
        idx = np.argsort(d, axis=-1)[:, :k]
        nn = np.where(np.take_along_axis(d, idx, -1) <= radius, idx, -1)
        return nn.astype(np.int64)

    def test_flags_low_confidence_cluster(self):
        coord, logits = self.make_scene()
        nn = self.neighbors_of(coord)
        mask = pseudo_labeling(
            coord, logits, nn,
            condition_from="msp", beta=1.5, seed_from="ml",
            seed_range=0.05, num_seed=20, slide_window=True,
            rng=np.random.RandomState(0),
        )
        assert mask.shape == (len(coord),)
        assert mask.dtype == bool
        if mask.any():
            # flagged points should be dominated by the true unknown cluster
            precision = mask[:80].sum() / mask.sum()
            assert precision > 0.5

    def test_empty_and_degenerate(self):
        coord, logits = self.make_scene(n=60, n_unknown=10)
        nn = self.neighbors_of(coord)
        mask = pseudo_labeling(coord, logits, nn,
                               rng=np.random.RandomState(1))
        assert mask.shape == (60,)
        assert pseudo_labeling(
            np.zeros((0, 3)), np.zeros((0, 4)), np.zeros((0, 8), np.int64)
        ).shape == (0,)


class TestRecognizerObjects:
    def test_msp_score(self):
        import jax.numpy as jnp

        rec = build_recognizer(dict(type="MaxProbability", method="msp"))
        logits = jnp.asarray(np.random.RandomState(0).randn(2, 16, 5))
        score = rec.score(logits)
        assert score.shape == (2, 16)
        assert rec.loss_weight(50) == 0.0

    def test_pointpdf_schedule(self):
        rec = build_recognizer(
            dict(
                type="PointPdf-v1m1",
                recognizer=dict(type="PointTransformer-Recognizer"),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
                loss_weight=0.01,
                step_loss_weight=True,
                num_classes=4,
                start_epoch=2,
                kp_ball_radius=0.1,
                kp_max_neighbor=8,
            )
        )
        assert rec.loss_weight(0) == 0.0
        assert rec.loss_weight(2) == pytest.approx(0.01)
        assert rec.loss_weight(3) == pytest.approx(0.01)
        assert rec.loss_weight(4) == pytest.approx(0.001)
        assert not rec.needs_pseudo(1) and rec.needs_pseudo(2)


@DATASETS.register_module(force=True)
class SyntheticOpenSegDataset:
    """Toy scenes with class 3 as the open-set unknown."""

    def __init__(self, split="train", num_scenes=8, num_points=128,
                 transform=None, loop=1, **kwargs):
        rng = np.random.RandomState(0 if split == "train" else 1)
        self.scenes = []
        for _ in range(num_scenes):
            n = int(num_points * rng.uniform(0.7, 1.0))
            coord = rng.rand(n, 3).astype(np.float32)
            color = np.zeros((n, 3), np.float32)
            segment = (
                (coord[:, 0] > 0.5).astype(np.int64) * 2
                + (coord[:, 1] > 0.5).astype(np.int64)
            )
            self.scenes.append(dict(coord=coord, color=color, segment=segment))
        self.transform = Compose(transform)
        self.loop = loop

    def __getitem__(self, idx):
        import copy

        return self.transform(copy.deepcopy(self.scenes[idx % len(self.scenes)]))

    def __len__(self):
        return len(self.scenes) * self.loop


def open_cfg(tmp_path, recognizer, epochs=1):
    transform = [
        dict(type="MaskLabel", mask_label=[3]),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "segment", "segment_known"),
             feat_keys=("coord", "color")),
    ]
    return Config(
        dict(
            batch_size=4,
            batch_size_val=4,
            num_worker=0,
            mix_prob=0.0,
            evaluate=True,
            seed=123,
            epoch=epochs,
            eval_epoch=epochs,
            weight=None,
            resume=False,
            save_path=str(tmp_path / "exp"),
            unknown_label=[3],
            model=dict(
                type="DefaultSegmentor",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=4),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
            ),
            recognizer=recognizer,
            optimizer=dict(type="SGD", lr=0.05, momentum=0.9,
                           weight_decay=0.0001),
            scheduler=dict(type="MultiStepLR", milestones=[0.6, 0.8],
                           gamma=0.1),
            data=dict(
                num_classes=4,
                ignore_index=-1,
                names=["a", "b", "c", "unk"],
                train=dict(type="SyntheticOpenSegDataset", split="train",
                           transform=transform),
                val=dict(type="SyntheticOpenSegDataset", split="val",
                         transform=transform),
            ),
            hooks=[
                dict(type="OpenSegCheckpointLoader"),
                dict(type="InformationWriter"),
                dict(type="OpenSegEvaluator"),
                dict(type="OpenSegCheckpointSaver"),
            ],
            train=dict(type="OpenSegTrainer"),
        )
    )


class TestOpenSegTrainer:
    def test_msp_end_to_end(self, tmp_path):
        cfg = open_cfg(tmp_path, dict(type="MaxProbability", method="msp"))
        cfg = default_setup(cfg)
        trainer = TRAINERS.build(dict(type="OpenSegTrainer", cfg=cfg))
        trainer.train()
        assert isinstance(trainer.best_metric_value, dict)
        assert "mIoU" in trainer.best_metric_value

    def test_pointpdf_end_to_end(self, tmp_path):
        recognizer = dict(
            type="PointPdf-v1m1",
            recognizer=dict(type="PointTransformer-Recognizer"),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            loss_weight=0.01,
            step_loss_weight=False,
            num_classes=4,
            start_epoch=1,  # second epoch activates pseudo-labeling
            kp_ball_radius=0.25,
            kp_max_neighbor=8,
            condition_from="msp",
            beta=1.5,
            seed_from="ml",
            seed_range=0.05,
            num_seed=5,
            slide_window=True,
            pseudo_jobs=1,
        )
        cfg = open_cfg(tmp_path, recognizer, epochs=2)
        cfg = default_setup(cfg)
        trainer = TRAINERS.build(dict(type="OpenSegTrainer", cfg=cfg))
        trainer.train()
        # recognizer params exist in the joint state and checkpoints save
        assert trainer.state.params["recognizer"]
        import os

        assert os.path.isfile(
            os.path.join(cfg.save_path, "model", "model_last.pth")
        )
