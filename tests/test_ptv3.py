"""PT-v3 serialized-attention model tests + hilbert serialization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.ops.serialization import hilbert_encode, serialize_code


class TestHilbert:
    def test_unit_steps_4cube(self):
        g = np.array(
            [[x, y, z] for x in range(4) for y in range(4) for z in range(4)]
        )
        codes = np.asarray(hilbert_encode(jnp.asarray(g), bits=2))
        assert len(np.unique(codes)) == 64  # bijective on the cube
        path = g[np.argsort(codes)]
        steps = np.abs(np.diff(path, axis=0)).sum(1)
        assert (steps == 1).all()  # true hilbert: adjacent cells only

    def test_orders_differ(self):
        g = jnp.asarray(np.random.RandomState(0).randint(0, 64, (50, 3)))
        codes = {
            o: np.asarray(serialize_code(g, o))
            for o in ("z", "z-trans", "hilbert", "hilbert-trans")
        }
        orders = {o: tuple(np.argsort(c)) for o, c in codes.items()}
        assert len(set(orders.values())) == 4


class TestPTv3:
    def make_batch(self, rng, B=2, N=96, C=6):
        coord = rng.rand(B, N, 3).astype(np.float32)
        grid = (coord / 0.05).astype(np.int32)
        mask = np.zeros((B, N), bool)
        mask[0] = True
        mask[1, : N * 3 // 4] = True
        return dict(
            coord=jnp.asarray(coord),
            grid_coord=jnp.asarray(grid),
            feat=jnp.asarray(rng.rand(B, N, C).astype(np.float32)),
            mask=jnp.asarray(mask),
        )

    @pytest.fixture(scope="class")
    def tiny(self):
        return build_model(
            dict(
                type="PT-v3m1",
                in_channels=6,
                order=("z", "hilbert"),
                stride=(2, 2),
                enc_depths=(1, 1, 1),
                enc_channels=(8, 16, 16),
                enc_num_head=(2, 2, 2),
                enc_patch_size=(16, 16, 16),
                dec_depths=(1, 1),
                dec_channels=(8, 16),
                dec_num_head=(2, 2),
                dec_patch_size=(16, 16),
                drop_path=0.1,
            )
        )

    def test_forward_and_padding(self, rng, tiny):
        batch = self.make_batch(rng)
        variables = jit_init(tiny, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(tiny, variables, batch, train=False)
        assert out.shape == (2, 96, 8)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[1, 72:], 0.0)

    def test_rpe_forward_and_grads(self, rng):
        model = build_model(
            dict(
                type="PT-v3m1",
                in_channels=6,
                order=("z",),
                stride=(2,),
                enc_depths=(1, 1),
                enc_channels=(8, 16),
                enc_num_head=(2, 2),
                enc_patch_size=(16, 16),
                dec_depths=(1,),
                dec_channels=(8,),
                dec_num_head=(2,),
                dec_patch_size=(16,),
                drop_path=0.0,
                enable_rpe=True,
                enable_flash=False,
            )
        )
        batch = self.make_batch(rng)
        variables = jit_init(
            model,
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=True,
        )
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        rpe_keys = [p for p, _ in flat if "rpe_table" in str(p)]
        assert rpe_keys, "RPE tables missing from params"

        @jax.jit
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(out ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        rpe_grads = [
            g for p, g in jax.tree_util.tree_leaves_with_path(grads)
            if "rpe_table" in str(p)
        ]
        assert rpe_grads
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in rpe_grads)
        out = jit_apply(model, variables, batch, train=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_grads(self, rng, tiny):
        batch = self.make_batch(rng)
        variables = jit_init(
            tiny,
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
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
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


class TestPTv3Capacity:
    """Per-level capacity shrink (the r3 fix for PT-v3's 10x slowdown:
    full-capacity deep stages ran 512-ch attention on buffers 16x their
    valid points).  On dense surface sheets (the indoor regime) a 0.5
    factor is lossless; on sparse random clouds drops must surface via
    the diagnostics sow, never silently."""

    def tiny_cfg(self, factor):
        return dict(
            type="PT-v3m1",
            in_channels=6,
            order=("z", "hilbert"),
            stride=(2, 2),
            enc_depths=(1, 1, 1),
            enc_channels=(8, 16, 16),
            enc_num_head=(2, 2, 2),
            enc_patch_size=(16, 16, 16),
            dec_depths=(1, 1),
            dec_channels=(8, 16),
            dec_num_head=(2, 2),
            dec_patch_size=(16, 16),
            drop_path=0.0,
            level_capacity_factor=factor,
            min_level_capacity=8,
        )

    def sheet_batch(self, rng, B=2, N=96):
        # dense height-field sheet: a 12x8 xy patch fully occupied, z
        # flat-ish -> every stride-2 parent holds >=2 children
        xs, ys = np.meshgrid(np.arange(12), np.arange(8), indexing="ij")
        grid = np.stack([xs, ys, (xs + ys) % 2], -1).reshape(1, 96, 3)
        grid = np.repeat(grid, B, axis=0).astype(np.int32)
        return dict(
            coord=jnp.asarray(grid.astype(np.float32) * 0.05),
            grid_coord=jnp.asarray(grid),
            feat=jnp.asarray(rng.rand(B, N, 6).astype(np.float32)),
            mask=jnp.ones((B, N), bool),
        )

    def test_shrunk_matches_full_on_sheets(self, rng):
        batch = self.sheet_batch(rng)
        full = build_model(self.tiny_cfg(1.0))
        half = build_model(self.tiny_cfg(0.5))
        # param shapes are capacity-independent: share one init
        variables = jit_init(full, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out_full = jit_apply(full, variables, batch, train=False)
        out_half, diag = half.apply(
            variables, batch, train=False, mutable=["diagnostics"])
        np.testing.assert_allclose(
            np.asarray(out_full), np.asarray(out_half), atol=1e-5)
        dropped = sum(
            int(np.asarray(v).sum())
            for v in jax.tree_util.tree_leaves(diag["diagnostics"]))
        assert dropped == 0

    def test_sparse_overflow_is_surfaced(self, rng):
        # random sparse cloud: stride-2 parents ~= children, so a 0.5
        # capacity must drop AND report it (ADVICE r2 medium: silent
        # voxel loss is the failure mode)
        N = 96
        grid = rng.randint(0, 40, (2, N, 3)).astype(np.int32)
        batch = dict(
            coord=jnp.asarray(grid.astype(np.float32) * 0.05),
            grid_coord=jnp.asarray(grid),
            feat=jnp.asarray(rng.rand(2, N, 6).astype(np.float32)),
            mask=jnp.ones((2, N), bool),
        )
        half = build_model(self.tiny_cfg(0.5))
        variables = jit_init(half, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out, diag = half.apply(
            variables, batch, train=False, mutable=["diagnostics"])
        assert np.isfinite(np.asarray(out)).all()
        dropped = sum(
            int(np.asarray(v).sum())
            for v in jax.tree_util.tree_leaves(diag["diagnostics"]))
        assert dropped > 0


class TestPTv3PDNorm:
    def test_pdnorm_bn_ln_conditions(self):
        import functools

        rng = np.random.RandomState(0)
        model = build_model(
            dict(
                type="PT-v3m1",
                in_channels=6,
                order=("z",),
                stride=(2,),
                enc_depths=(1, 1),
                enc_channels=(8, 16),
                enc_num_head=(2, 2),
                enc_patch_size=(16, 16),
                dec_depths=(1,),
                dec_channels=(8,),
                dec_num_head=(2,),
                dec_patch_size=(16,),
                drop_path=0.0,
                pdnorm_bn=True,
                pdnorm_ln=True,
                pdnorm_decouple=True,
                pdnorm_adaptive=False,
                pdnorm_conditions=("ScanNet", "S3DIS"),
            )
        )
        coord = rng.rand(2, 96, 3).astype(np.float32)
        batch = dict(
            coord=jnp.asarray(coord),
            grid_coord=jnp.asarray((coord / 0.05).astype(np.int32)),
            feat=jnp.asarray(rng.rand(2, 96, 6).astype(np.float32)),
            mask=jnp.ones((2, 96), bool),
        )
        variables = jax.jit(
            functools.partial(model.init, train=False, condition="ScanNet")
        )({"params": jax.random.PRNGKey(0)}, batch)
        # decoupled banks present in both BN stats and LN affine params
        stats = jax.tree_util.tree_leaves(variables["batch_stats"])
        assert stats and all(s.shape[0] == 2 for s in stats)
        out = jax.jit(
            functools.partial(model.apply, train=False, condition="S3DIS")
        )(variables, batch)
        assert out.shape == (2, 96, 8)
        assert np.isfinite(np.asarray(out)).all()
