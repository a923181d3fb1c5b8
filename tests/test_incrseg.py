"""Incremental-learning stack tests: KL distill loss, weight transfer,
trainer end-to-end on the virtual CPU mesh."""

import os

import numpy as np
import pytest

from pointcloudpdf_tpu.datasets import DATASETS
from pointcloudpdf_tpu.datasets.transform import Compose
from pointcloudpdf_tpu.engines.defaults import default_setup
from pointcloudpdf_tpu.engines.train import TRAINERS
from pointcloudpdf_tpu.incr_learners import incr_distill_kl_loss
from pointcloudpdf_tpu.utils.config import Config


class TestIncrDistillKlLoss:
    def test_matches_manual_kl(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        B, N, Kb, Kn = 2, 16, 3, 5
        pred = rng.randn(B, N, Kn).astype(np.float32)
        target = rng.randn(B, N, Kb).astype(np.float32)
        seg_incr = np.full((B, N), -1, np.int64)
        seg_incr[0, :4] = 3  # labeled new-class points
        mask = np.ones((B, N), bool)
        mask[1, 10:] = False

        loss = float(incr_distill_kl_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(seg_incr),
            jnp.asarray(mask),
        ))

        # manual numpy KL over valid points
        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        log_p = np.log(softmax(pred))
        q = np.concatenate(
            [softmax(target), np.zeros((B, N, Kn - Kb))], axis=-1
        )
        for b in range(B):
            for n in range(N):
                if seg_incr[b, n] != -1:
                    q[b, n] = np.eye(Kn)[seg_incr[b, n]]
        with np.errstate(divide="ignore", invalid="ignore"):
            log_q = np.where(q > 0, np.log(q), 0.0)
        kl = (q * (log_q - log_p)).sum(-1)
        expected = kl[mask].sum() / mask.sum()
        assert loss == pytest.approx(expected, rel=1e-5)

    def test_one_hot_dominates_at_labeled_points(self):
        import jax.numpy as jnp

        # student already predicting the new class at labeled points
        pred = np.full((1, 4, 5), -5.0, np.float32)
        pred[..., 4] = 5.0
        target = np.zeros((1, 4, 3), np.float32)
        seg_incr = np.full((1, 4), 4, np.int64)
        mask = np.ones((1, 4), bool)
        loss = float(incr_distill_kl_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(seg_incr),
            jnp.asarray(mask),
        ))
        assert loss < 0.01


@DATASETS.register_module(force=True)
class SyntheticIncrSegDataset:
    """Toy scenes; class 3 remapped to incremental id 4."""

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


def incr_cfg(tmp_path, base_ckpt=None):
    transform = [
        dict(type="RemapLabel", remap_dict={3: 4}, remap_select=[3]),
        dict(type="ToTensor"),
        dict(type="Collect",
             keys=("coord", "segment", "segment_incr", "segment_incr_remap"),
             feat_keys=("coord", "color")),
    ]
    return Config(
        dict(
            batch_size=4,
            batch_size_val=4,
            num_worker=0,
            mix_prob=0.0,
            evaluate=True,
            seed=7,
            epoch=1,
            eval_epoch=1,
            weight=None,
            resume=False,
            incr_resume=False,
            base_ckpt=base_ckpt,
            incr_ckpt=None,
            load_base_weight_to_incr_learner=base_ckpt is not None,
            base_weight_process_func="trim_base_weight_head",
            save_path=str(tmp_path / "exp"),
            unknown_label=[3],
            incr_label_remap={3: 4},
            incr_label_select=[3],
            model=dict(
                type="DefaultSegmentor",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=4),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
            ),
            incremental_learner=dict(
                type="PointPdf-incr-v1m1",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=5),
                eval_criteria=[dict(type="CrossEntropyLoss", loss_weight=1,
                                    ignore_index=-1)],
            ),
            optimizer=dict(type="SGD", lr=0.05, momentum=0.9,
                           weight_decay=0.0001),
            scheduler=dict(type="MultiStepLR", milestones=[0.6, 0.8],
                           gamma=0.1),
            data=dict(
                num_classes=4,
                ignore_index=-1,
                names=["a", "b", "c", "incr_cls"],
                train=dict(type="SyntheticIncrSegDataset", split="train",
                           transform=transform),
                val=dict(type="SyntheticIncrSegDataset", split="val",
                         transform=transform),
            ),
            hooks=[
                dict(type="IncrSegCheckpointLoader"),
                dict(type="InformationWriter"),
                dict(type="IncrSegEvaluator"),
                dict(type="IncrSegCheckpointSaver"),
            ],
            train=dict(type="IncrSegTrainer"),
        )
    )


class TestIncrSegTrainer:
    def make_base_checkpoint(self, tmp_path):
        """Closed-set checkpoint from raw init (enough for the loader path)."""
        import jax

        from pointcloudpdf_tpu.models import build_model
        from pointcloudpdf_tpu.utils.checkpoint import save_checkpoint, to_host

        model = build_model(
            dict(
                type="DefaultSegmentor",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=4),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
            )
        )
        rng = np.random.RandomState(0)
        batch = dict(
            coord=rng.rand(1, 256, 3).astype(np.float32),
            feat=rng.rand(1, 256, 6).astype(np.float32),
            mask=np.ones((1, 256), bool),
        )
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        from conftest import jit_init

        variables = jit_init(model, {"params": jax.random.PRNGKey(5)}, batch,
                             train=False)
        path = str(tmp_path / "base.pth")
        save_checkpoint(
            path,
            dict(
                epoch=1,
                state=to_host(
                    dict(params=variables["params"],
                         batch_stats=variables.get("batch_stats", {}))
                ),
            ),
        )
        return path, to_host(variables["params"])

    def test_train_with_base_transfer(self, tmp_path):
        base_path, base_params = self.make_base_checkpoint(tmp_path)
        cfg = default_setup(incr_cfg(tmp_path, base_ckpt=base_path))
        trainer = TRAINERS.build(dict(type="IncrSegTrainer", cfg=cfg))
        trainer.train()
        assert isinstance(trainer.best_metric_value, dict)
        assert "mIoU_incr" in trainer.best_metric_value
        # head transfer: student cls2 kernel (32,5) carries the base (32,4)
        # in its first 4 output columns
        import jax

        stu = jax.device_get(trainer.state.params["incr"])
        base_k = base_params["backbone_module"]["cls2"]["kernel"]
        # the student trained one epoch, so compare against non-trained
        # teacher copy instead: teacher variables must equal the checkpoint
        teach = jax.device_get(trainer.teacher_variables["params"])
        np.testing.assert_allclose(
            teach["backbone_module"]["cls2"]["kernel"], base_k
        )
        assert stu["cls2"]["kernel"].shape[-1] == 5
        assert os.path.isfile(
            os.path.join(cfg.save_path, "model", "model_last.pth")
        )
