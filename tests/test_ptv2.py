"""PT-v2 grouped-vector-attention model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
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


@pytest.fixture(scope="module")
def tiny():
    return build_model(
        dict(
            type="PT-v2m2",
            in_channels=6,
            num_classes=5,
            patch_embed_depth=1,
            patch_embed_channels=8,
            patch_embed_groups=2,
            patch_embed_neighbours=4,
            enc_depths=(1, 1),
            enc_channels=(8, 16),
            enc_groups=(2, 4),
            enc_neighbours=(4, 4),
            dec_depths=(1, 1),
            dec_channels=(8, 8),
            dec_groups=(2, 2),
            dec_neighbours=(4, 4),
            grid_sizes=(0.12, 0.24),
            drop_path_rate=0.1,
        )
    )


def test_forward_and_padding(tiny):
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = jit_init(tiny, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    out = jit_apply(tiny, variables, batch, train=False)
    assert out.shape == (2, 64, 5)
    assert np.isfinite(np.asarray(out)).all()
    assert np.allclose(np.asarray(out)[1, 48:], 0.0)


def test_train_grads(tiny):
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    variables = jit_init(
        tiny,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )

    @jax.jit
    def loss_fn(params):
        out, _ = tiny.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_capacity_shrink_matches_full():
    """level_capacity_factor < 1 must be a pure buffer-size change: on a
    cloud whose voxel pooling merges enough children, the shrunk model's
    logits equal the full-capacity model's exactly, and the overflow
    diagnostic is zero (the 8.5x PT-v2 bench win rides this)."""
    import functools

    cfg = dict(
        type="PT-v2m2", in_channels=6, num_classes=5,
        patch_embed_depth=1, patch_embed_channels=8,
        patch_embed_groups=2, patch_embed_neighbours=4,
        enc_depths=(1, 1), enc_channels=(8, 16), enc_groups=(2, 4),
        enc_neighbours=(4, 4), dec_depths=(1, 1), dec_channels=(8, 8),
        dec_groups=(2, 2), dec_neighbours=(4, 4),
        grid_sizes=(0.12, 0.24), drop_path_rate=0.0,
    )
    rng = np.random.RandomState(0)
    # dense-in-few-voxels cloud: 128 points over an 0.3-cube -> each
    # 0.12-voxel holds many children, so cap = N//2 drops nothing
    batch = dict(
        coord=jnp.asarray(rng.rand(2, 128, 3).astype(np.float32) * 0.3),
        feat=jnp.asarray(rng.rand(2, 128, 6).astype(np.float32)),
        mask=jnp.ones((2, 128), bool),
    )
    full = build_model(cfg)
    shrunk = build_model(dict(cfg, level_capacity_factor=0.5,
                              min_level_capacity=8))
    v = jit_init(full, {"params": jax.random.PRNGKey(0)}, batch,
                 train=False)
    ref = jit_apply(full, v, batch, train=False)
    got, diag = jax.jit(functools.partial(
        shrunk.apply, train=False, mutable=["diagnostics"]))(v, batch)
    dropped = sum(
        int(np.asarray(x).sum())
        for x in jax.tree_util.tree_leaves(diag.get("diagnostics", {})))
    assert dropped == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
