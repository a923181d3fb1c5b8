"""Tests for the core runtime: registry, config merge, events, metrics."""

import os

import numpy as np
import pytest

from pointcloudpdf_tpu.utils import (
    AverageMeter,
    Config,
    EventStorage,
    Registry,
    average_precision,
    aupr_and_auroc,
    get_event_storage,
    intersection_and_union_np,
    merge_dict,
    roc_auc,
    set_seed,
)


class TestRegistry:
    def test_register_and_build(self):
        reg = Registry("test")

        @reg.register_module()
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = reg.build(dict(type="Foo", a=1))
        assert obj.a == 1 and obj.b == 2

    def test_named_registration(self):
        reg = Registry("test")

        @reg.register_module("Alias-v1")
        class Foo:
            pass

        assert "Alias-v1" in reg
        assert reg.build(dict(type="Alias-v1")).__class__ is Foo

    def test_duplicate_raises(self):
        reg = Registry("test")
        reg.register_module(module=lambda: None, name="x")
        with pytest.raises(KeyError):
            reg.register_module(module=lambda: None, name="x")

    def test_missing_type(self):
        reg = Registry("test")
        with pytest.raises(KeyError):
            reg.build(dict(type="Nope"))

    def test_default_args(self):
        reg = Registry("test")

        @reg.register_module()
        class Bar:
            def __init__(self, a, b):
                self.a, self.b = a, b

        obj = reg.build(dict(type="Bar", a=1), default_args=dict(b=9))
        assert obj.b == 9


class TestConfig:
    def test_base_merge(self, tmp_path):
        base = tmp_path / "base.py"
        base.write_text("x = 1\nmodel = dict(type='A', depth=2)\n")
        child = tmp_path / "child.py"
        child.write_text(
            "_base_ = ['base.py']\nmodel = dict(depth=5)\ny = 3\n"
        )
        cfg = Config.fromfile(str(child))
        assert cfg.x == 1 and cfg.y == 3
        assert cfg.model.type == "A" and cfg.model.depth == 5

    def test_delete_key(self, tmp_path):
        base = tmp_path / "base.py"
        base.write_text("model = dict(type='A', depth=2)\n")
        child = tmp_path / "child.py"
        child.write_text("_base_ = ['base.py']\nmodel = dict(_delete_=True, type='B')\n")
        cfg = Config.fromfile(str(child))
        assert cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model) == dict(type="B")

    def test_options_override(self, tmp_path):
        f = tmp_path / "c.py"
        f.write_text("optimizer = dict(type='SGD', lr=0.5)\nepoch = 10\n")
        cfg = Config.fromfile(str(f))
        cfg.merge_from_dict({"optimizer.lr": 0.1, "epoch": 2})
        assert cfg.optimizer.lr == 0.1 and cfg.epoch == 2

    def test_merge_dict_nested(self):
        a = dict(m=dict(x=1, y=2), k=3)
        b = dict(m=dict(y=5))
        out = merge_dict(a, b)
        assert out == dict(m=dict(x=1, y=5), k=3)


class TestEvents:
    def test_storage_context(self):
        with EventStorage() as storage:
            assert get_event_storage() is storage
            storage.put_scalar("loss", 2.0)
            storage.put_scalar("loss", 4.0)
            assert storage.history("loss").avg(10) == 3.0
            assert storage.latest["loss"] == 4.0
        with pytest.raises(RuntimeError):
            get_event_storage()

    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0 and m.val == 3.0 and m.count == 2


class TestMetrics:
    def test_iou_np(self):
        pred = np.array([0, 1, 2, 2, 1])
        target = np.array([0, 1, 1, 2, -1])
        inter, union, tgt = intersection_and_union_np(pred, target, 3)
        np.testing.assert_array_equal(inter, [1, 1, 1])
        np.testing.assert_array_equal(tgt, [1, 2, 1])
        np.testing.assert_array_equal(union, [1, 2, 2])

    def test_iou_device_matches_np(self, rng):
        import jax.numpy as jnp

        from pointcloudpdf_tpu.utils import intersection_and_union

        pred = rng.randint(0, 5, 100)
        target = rng.randint(-1, 5, 100)
        i1, u1, t1 = intersection_and_union_np(pred, target, 5)
        i2, u2, t2 = intersection_and_union(jnp.asarray(pred), jnp.asarray(target), 5)
        np.testing.assert_allclose(np.asarray(i2), i1)
        np.testing.assert_allclose(np.asarray(u2), u1)
        np.testing.assert_allclose(np.asarray(t2), t1)

    def test_aupr_auroc_match_sklearn(self, rng):
        from sklearn.metrics import average_precision_score, roc_auc_score

        labels = rng.randint(0, 2, 500)
        scores = rng.randn(500) + labels * 0.8
        assert average_precision(labels, scores) == pytest.approx(
            average_precision_score(labels, scores), abs=1e-9
        )
        assert roc_auc(labels, scores) == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-9
        )

    def test_aupr_ignore_index(self, rng):
        target = np.array([1, 0, 0, 1, -1, -1])
        scores = np.array([0.9, 0.1, 0.2, 0.8, 5.0, -5.0])
        aupr, auroc = aupr_and_auroc(scores, target)
        assert aupr == pytest.approx(1.0)
        assert auroc == pytest.approx(1.0)


def test_set_seed_deterministic():
    set_seed(123)
    a = np.random.rand(5)
    set_seed(123)
    b = np.random.rand(5)
    np.testing.assert_array_equal(a, b)
