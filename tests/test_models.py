"""Model-layer contracts: shapes, masking invariance, loss behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudpdf_tpu.models import MODELS, build_model, build_criteria
from conftest import jit_apply, jit_init


def make_batch(rng, B=2, N=256, C=6, num_classes=13, counts=(256, 200)):
    coord = rng.rand(B, N, 3).astype(np.float32)
    feat = rng.rand(B, N, C).astype(np.float32)
    mask = np.zeros((B, N), bool)
    segment = np.full((B, N), -1, np.int64)
    for i, c in enumerate(counts):
        mask[i, :c] = True
        segment[i, :c] = rng.randint(0, num_classes, c)
    return dict(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        mask=jnp.asarray(mask),
        segment=jnp.asarray(segment),
    )


@pytest.fixture(scope="module")
def seg_model_and_vars():
    model = build_model(
        dict(
            type="DefaultSegmentor",
            backbone=dict(type="PointTransformer-Seg26", in_channels=6, num_classes=13),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        )
    )
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    return model, variables, batch


class TestPTSeg:
    def test_forward_shapes(self, seg_model_and_vars):
        model, variables, batch = seg_model_and_vars
        out = jit_apply(model, variables, batch, train=False)
        assert out["seg_logits"].shape == (2, 256, 13)
        inter = out["intermediates"]
        assert set(inter) == {f"enc{i}" for i in range(1, 6)} | {
            f"dec{i}" for i in range(1, 6)
        }
        # encoder capacities shrink by 4x per level
        assert inter["enc1"].coord.shape[1] == 256
        assert inter["enc2"].coord.shape[1] == 64
        assert inter["enc5"].coord.shape[1] == 1

    def test_loss_finite(self, seg_model_and_vars):
        model, variables, batch = seg_model_and_vars
        out, mutated = jit_apply(
            model, variables, batch,
            rngs={"dropout": jax.random.PRNGKey(1)},
            train=True, mutable=["batch_stats"],
        )
        loss = model.loss(out["seg_logits"], batch["segment"])
        assert np.isfinite(float(loss))

    def test_padding_invariance(self, seg_model_and_vars):
        """Valid outputs must not depend on values stored in padded slots."""
        model, variables, batch = seg_model_and_vars
        out1 = jit_apply(model, variables, batch, train=False)["seg_logits"]
        poisoned = dict(batch)
        noise = np.random.RandomState(1).rand(2, 256, 3).astype(np.float32) * 50
        pad = ~np.asarray(batch["mask"])
        poisoned["coord"] = jnp.where(
            jnp.asarray(pad)[..., None], jnp.asarray(noise), batch["coord"]
        )
        poisoned["feat"] = jnp.where(
            jnp.asarray(pad)[..., None],
            jnp.asarray(noise.repeat(2, axis=-1)),
            batch["feat"],
        )
        out2 = jit_apply(model, variables, poisoned, train=False)["seg_logits"]
        valid = np.asarray(batch["mask"])
        np.testing.assert_allclose(
            np.asarray(out1)[valid], np.asarray(out2)[valid], rtol=2e-2, atol=2e-2
        )


class TestPTCls:
    def test_forward(self):
        model = build_model(
            dict(
                type="DefaultClassifier",
                backbone=dict(
                    type="PointTransformer-Cls26", in_channels=6, num_classes=40
                ),
                criteria=[dict(type="SmoothCELoss", smoothing_ratio=0.1)],
                num_classes=40,
            )
        )
        rng = np.random.RandomState(0)
        batch = make_batch(rng, B=2, N=256, C=3)
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(model, variables, batch, train=False)
        assert out["cls_logits"].shape == (2, 40)
        target = jnp.asarray(np.array([3, 7]))
        loss = model.loss(out["cls_logits"], target)
        assert np.isfinite(float(loss))


class TestLosses:
    def test_cross_entropy_ignores_padding(self):
        ce = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
        logits = jnp.asarray(np.random.RandomState(0).randn(10, 4).astype(np.float32))
        target = jnp.asarray(np.array([0, 1, 2, 3, 0, -1, -1, -1, -1, -1]))
        loss_masked = ce(logits, target)
        loss_short = ce(logits[:5], target[:5])
        np.testing.assert_allclose(float(loss_masked), float(loss_short), rtol=1e-6)

    def test_cross_entropy_matches_manual(self):
        ce = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
        logits = np.random.RandomState(0).randn(6, 3).astype(np.float32)
        target = np.array([0, 1, 2, 0, 1, 2])
        expected = -np.mean(
            np.log(
                np.exp(logits[np.arange(6), target])
                / np.exp(logits).sum(1)
            )
        )
        np.testing.assert_allclose(
            float(ce(jnp.asarray(logits), jnp.asarray(target))), expected, rtol=1e-5
        )

    def test_lovasz_finite(self):
        lv = build_criteria([dict(type="LovaszLoss", mode="multiclass", ignore_index=-1)])
        logits = jnp.asarray(np.random.RandomState(0).randn(50, 5).astype(np.float32))
        target = jnp.asarray(np.random.RandomState(1).randint(-1, 5, 50))
        loss = lv(logits, target)
        assert np.isfinite(float(loss)) and 0 <= float(loss) <= 1


class TestAmpPath:
    """amp=True runs the PT-v1 feature path in bfloat16; predictions must
    essentially match the f32 run (params/BN stats/softmax/logits stay
    f32)."""

    def test_bf16_matches_f32(self):
        rng = np.random.RandomState(3)
        batch = make_batch(rng)

        def run(amp):
            model = build_model(dict(
                type="DefaultSegmentor",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=13, amp=amp),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
            ))
            variables = jit_init(model, {"params": jax.random.PRNGKey(0)},
                                 batch, train=False)
            out = jit_apply(model, variables, batch, train=False)
            return np.asarray(out["seg_logits"])

        f32 = run(False)
        bf16 = run(True)
        assert bf16.dtype == np.float32  # head returns f32 either way
        mask = np.asarray(batch["mask"])
        agree = (f32.argmax(-1) == bf16.argmax(-1))[mask].mean()
        # untrained logits are near-uniform, so argmax ties flip under
        # bf16 rounding — 0.95 bounds real divergence without pinning noise
        assert agree >= 0.95, f"bf16 predictions diverged: {agree}"
        # relative error on valid logits stays at bf16 noise level
        denom = np.maximum(np.abs(f32[mask]), 1.0)
        assert np.median(np.abs(f32[mask] - bf16[mask]) / denom) < 0.05
