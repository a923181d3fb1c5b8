"""Stratified Transformer + STRecognizer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
import pointcloudpdf_tpu.recognizers  # noqa: F401  (registers ST recognizer)
from pointcloudpdf_tpu.models import build_model


def make_batch(rng, B=2, N=64, C=6):
    coord = rng.rand(B, N, 3).astype(np.float32)
    mask = np.zeros((B, N), bool)
    mask[0] = True
    mask[1, : N * 3 // 4] = True
    return dict(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(rng.rand(B, N, C).astype(np.float32)),
        mask=jnp.asarray(mask),
    )


TINY = dict(
    type="ST-v1m1",
    downsample_scale=4,
    depths=[1, 2, 1],
    channels=[8, 16, 16],
    num_heads=[2, 2, 2],
    window_size=[0.2, 0.4, 0.8],
    up_k=3,
    grid_sizes=[0.1, 0.2, 0.4],
    quant_sizes=[0.01, 0.02, 0.04],
    rel_query=True,
    rel_key=True,
    rel_value=True,
    drop_path_rate=0.1,
    num_layers=3,
    num_classes=4,
    ratio=0.5,
    k=4,
    prev_grid_size=0.1,
    kp_ball_radius=0.25,
    kp_max_neighbor=8,
    k_local=8,
    k_sparse=4,
)


@pytest.fixture(scope="module")
def st_and_vars():
    model = build_model(dict(TINY))
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    return model, variables, batch


class TestST:
    def test_forward_shapes(self, st_and_vars):
        model, variables, batch = st_and_vars
        logits, inter = jit_apply(model, variables, batch, train=False)
        assert logits.shape == (2, 64, 4)
        assert np.isfinite(np.asarray(logits)).all()
        assert np.allclose(np.asarray(logits)[1, 48:], 0.0)
        # intermediates expose the upsample ladder for the recognizer
        assert "stem" in inter and "enc2" in inter and "up0" in inter
        assert "up1" in inter  # stem up included (2 ups for 3 layers)

    def test_recognizer_consumes_intermediates(self, st_and_vars):
        model, variables, batch = st_and_vars
        _, inter = jit_apply(model, variables, batch, train=False)
        rec = build_model(
            dict(type="ST-v1m1-Recognizer", up_k=3, channels=[8, 16, 16],
                 num_layers=3)
        )
        rec_vars = jit_init(rec, {"params": jax.random.PRNGKey(2)}, inter,
                            train=False)
        conf = jit_apply(rec, rec_vars, inter, train=False)
        assert conf.shape == (2, 64, 1)
        assert np.isfinite(np.asarray(conf)).all()

    def test_train_grads(self, st_and_vars):
        model, variables, batch = st_and_vars

        @jax.jit
        def loss_fn(params):
            (logits, _), _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return jnp.sum(logits ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_st_v1m2_refined_builds_and_runs():
    model = build_model(
        dict(
            type="ST-v1m2",
            in_channels=6,
            num_classes=4,
            channels=(8, 16, 16, 16),
            num_heads=(2, 2, 2),
            depths=(1, 1, 1),
            window_size=(0.2, 0.4, 0.8),
            quant_size=(0.01, 0.02, 0.04),
            down_ratio=0.5,
            down_num_sample=4,
            kp_ball_radius=0.25,
            kp_max_neighbor=8,
            kp_grid_size=0.1,
            k_local=8,
            k_sparse=4,
        )
    )
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    logits, inter = jit_apply(model, variables, batch, train=False)
    assert logits.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(logits)).all()
    # all three transformer layers exist (v1m2 drives layers 1..3)
    names = [str(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("layer1_block0" in s for s in names)
    assert any("layer3_block0" in s for s in names)
