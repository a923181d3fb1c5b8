"""OctFormer (dilated octree attention) and Swin3D (cRSE windows) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model


def make_batch(rng, B=2, N=96, C=6, grid_div=0.1):
    coord = rng.rand(B, N, 3).astype(np.float32)
    mask = np.zeros((B, N), bool)
    mask[0] = True
    mask[1, : N * 3 // 4] = True
    return dict(
        coord=jnp.asarray(coord),
        grid_coord=jnp.asarray((coord / grid_div).astype(np.int32)),
        feat=jnp.asarray(rng.rand(B, N, C).astype(np.float32)),
        mask=jnp.asarray(mask),
    )


class TestOctFormer:
    @pytest.fixture(scope="class")
    def tiny(self):
        return build_model(
            dict(
                type="OctFormer-v1m1",
                in_channels=6,
                num_classes=5,
                fpn_channels=8,
                channels=(8, 8, 16, 16),
                num_blocks=(2, 1, 1, 1),
                num_heads=(2, 2, 2, 2),
                patch_size=8,
                dilation=2,
                stem_down=2,
                head_up=2,
                drop_path=0.1,
            )
        )

    def test_forward_padding_and_shape(self, rng, tiny):
        batch = make_batch(rng, grid_div=0.05)
        variables = jit_init(tiny, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(tiny, variables, batch, train=False)
        assert out.shape == (2, 96, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[1, 72:], 0.0)
        names = [str(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])]
        # dilated blocks carry their own RPE tables; FPN + head_up exist
        assert any("rpe_table" in s for s in names)
        assert any("fpn_3x3_" in s for s in names)
        assert any("head_up1" in s for s in names)

    def test_grads_flow(self, rng, tiny):
        batch = make_batch(rng, grid_div=0.05)
        variables = jit_init(
            tiny,
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=True,
        )

        @jax.jit
        def loss_fn(params):
            out, _ = tiny.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(out ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
        rpe = [g for p, g in flat if "rpe_table" in str(p)]
        assert rpe and any(float(jnp.sum(jnp.abs(g))) > 0 for g in rpe)


class TestSwin3D:
    @pytest.fixture(scope="class")
    def tiny(self):
        return build_model(
            dict(
                type="Swin3D-v1m1",
                in_channels=6,
                num_classes=5,
                depths=(1, 1, 1),
                channels=(8, 16, 16),
                num_heads=(2, 2, 2),
                window_sizes=(3, 3, 3),
                quant_size=2,
                num_layers=3,
                stem_transformer=True,
                patch_cap=16,
                drop_path_rate=0.1,
            )
        )

    def test_forward_padding_and_shape(self, rng, tiny):
        batch = make_batch(rng)
        variables = jit_init(tiny, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(tiny, variables, batch, train=False)
        assert out.shape == (2, 96, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[1, 72:], 0.0)
        # cRSE q/k/v tables exist for both XYZ and RGB groups
        names = [str(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])]
        for want in ("query_xyz_table", "key_xyz_table", "value_xyz_table",
                     "query_rgb_table", "value_rgb_table"):
            assert any(want in s for s in names), want

    def test_crse_tables_get_grads(self, rng, tiny):
        batch = make_batch(rng)
        variables = jit_init(
            tiny,
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=True,
        )

        @jax.jit
        def loss_fn(params):
            out, _ = tiny.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(out ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
        for want in ("query_xyz_table", "key_rgb_table", "value_xyz_table"):
            gs = [g for p, g in flat if want in str(p)]
            assert gs and any(float(jnp.sum(jnp.abs(g))) > 0 for g in gs), want

    def test_window_mask_blocks_cross_window_pairs(self, rng):
        # two well-separated clusters must not attend to each other: with
        # identical features inside each cluster, outputs are cluster-pure
        from pointcloudpdf_tpu.models.swin3d.swin3d import _window_sort

        grid = np.zeros((1, 8, 3), np.int32)
        grid[0, 4:] = 50                       # far window
        mask = np.ones((1, 8), bool)
        order, inverse, win = _window_sort(
            jnp.asarray(grid), jnp.asarray(mask), 4, False
        )
        w = np.asarray(win)[0]
        assert len(np.unique(w)) == 2
        # sorted layout keeps windows contiguous
        assert (np.sort(w) == w).all()


def test_swin3d_norm_group_and_attn_upsample(rng):
    model = build_model(
        dict(
            type="Swin3D-v1m1",
            in_channels=9,
            num_classes=5,
            depths=(1, 1, 1),
            channels=(8, 16, 16),
            num_heads=(2, 2, 2),
            window_sizes=(3, 3, 3),
            quant_size=2,
            num_layers=3,
            stem_transformer=True,
            upsample="linear_attn",
            cRSE="XYZ_RGB_NORM",
            patch_cap=16,
        )
    )
    batch = make_batch(rng, C=9)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=False)
    names = [str(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("query_norm_table" in s for s in names)
    assert any("up2_attn" in s for s in names)
    out = jit_apply(model, variables, batch, train=False)
    assert out.shape == (2, 96, 5)
    assert np.isfinite(np.asarray(out)).all()
