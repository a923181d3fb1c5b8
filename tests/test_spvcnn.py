"""SPVCNN tests: trilinear devoxelization contract + model forward/grad."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.models.spvcnn import trilinear_devoxelize
from pointcloudpdf_tpu.ops.voxel import unique_parents


class TestTrilinearDevoxelize:
    def test_stride1_reads_own_voxel(self, rng):
        n = 32
        grid = jnp.asarray(rng.randint(0, 8, (n, 3)), jnp.int32)
        mask = jnp.asarray(np.arange(n) < 24)
        v_grid, v_mask, p2v = unique_parents(grid, mask, 1)
        feat = jnp.asarray(rng.randn(n, 5).astype(np.float32))
        feat = jnp.where(v_mask[:, None], feat, 0.0)
        out = np.asarray(
            jax.jit(lambda *a: trilinear_devoxelize(*a, 1))(
                grid, mask, v_grid, v_mask, feat
            )
        )
        p2v = np.asarray(p2v)
        for i in range(24):
            np.testing.assert_allclose(
                out[i], np.asarray(feat)[p2v[i]], rtol=1e-6
            )
        assert np.allclose(out[24:], 0.0)

    def test_matches_bruteforce_at_stride2(self, rng):
        n = 48
        grid = jnp.asarray(rng.randint(0, 10, (n, 3)), jnp.int32)
        mask = jnp.asarray(np.ones(n, bool))
        l_grid, l_mask, _ = unique_parents(grid, mask, 2)
        feat = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        feat = jnp.where(l_mask[:, None], feat, 0.0)
        out = np.asarray(
            jax.jit(lambda *a: trilinear_devoxelize(*a, 2))(
                grid, mask, l_grid, l_mask, feat
            )
        )
        g = np.asarray(grid)
        lg = np.asarray(l_grid)
        lm = np.asarray(l_mask)
        f = np.asarray(feat)
        table = {tuple(lg[i]): i for i in range(n) if lm[i]}
        for i in range(n):
            cell = g[i] // 2
            frac = (g[i] % 2) / 2.0
            expect = np.zeros(3, np.float32)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        w = (
                            (frac[0] if dx else 1 - frac[0])
                            * (frac[1] if dy else 1 - frac[1])
                            * (frac[2] if dz else 1 - frac[2])
                        )
                        j = table.get((cell[0] + dx, cell[1] + dy, cell[2] + dz))
                        if j is not None:
                            expect += w * f[j]
            np.testing.assert_allclose(out[i], expect, rtol=1e-5, atol=1e-6)


class TestSPVCNN:
    def make_batch(self, rng, B=2, N=96, C=4, num_classes=5):
        coord = rng.rand(B, N, 3).astype(np.float32)
        grid = (coord / 0.1).astype(np.int32)
        feat = rng.rand(B, N, C).astype(np.float32)
        mask = np.zeros((B, N), bool)
        mask[0] = True
        mask[1, : N * 3 // 4] = True
        return dict(
            grid_coord=jnp.asarray(grid),
            coord=jnp.asarray(coord),
            feat=jnp.asarray(feat),
            mask=jnp.asarray(mask),
        )

    @pytest.fixture(scope="class")
    def tiny(self):
        return build_model(
            dict(
                type="SPVCNN",
                in_channels=4,
                out_channels=5,
                base_channels=8,
                channels=(8, 8, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
            )
        )

    def test_forward_padding_and_shape(self, rng, tiny):
        batch = self.make_batch(rng)
        variables = jit_init(tiny, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(tiny, variables, batch, train=False)
        assert out.shape == (2, 96, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[1, 72:], 0.0)
        # the point branch exists: point_transform params present
        names = [str(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])]
        assert any("point_transform0" in s for s in names)
        assert any("point_transform2" in s for s in names)

    def test_grad_flows_through_point_branch(self, rng, tiny):
        batch = self.make_batch(rng)
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
        pt_grads = [g for p, g in flat if "point_transform" in str(p)]
        assert pt_grads
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in pt_grads)
