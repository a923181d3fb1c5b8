"""SpUNet + voxel-op tests: hash maps vs brute force, model contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.ops.voxel import (
    build_table,
    gather_conv,
    kernel_offsets,
    lookup,
    neighbor_table,
    unique_parents,
)


def random_voxels(rng, n_valid, n_pad, extent=16):
    """Unique random voxel coords padded to n_pad."""
    seen = set()
    while len(seen) < n_valid:
        seen.add(tuple(rng.randint(0, extent, 3)))
    grid = np.zeros((n_pad, 3), np.int32)
    grid[:n_valid] = np.array(sorted(seen), np.int32)
    mask = np.zeros(n_pad, bool)
    mask[:n_valid] = True
    return jnp.asarray(grid), jnp.asarray(mask)


class TestVoxelOps:
    def test_lookup_roundtrip(self, rng):
        grid, mask = random_voxels(rng, 50, 64)
        keys, rows = build_table(grid, mask)
        from pointcloudpdf_tpu.ops.voxel import pack_grid

        q = pack_grid(grid[:50])
        found = lookup(keys, rows, q)
        np.testing.assert_array_equal(np.asarray(found), np.arange(50))
        # a key that does not exist misses
        missing = pack_grid(jnp.asarray([[1000, 1000, 500]], jnp.int32))
        assert int(lookup(keys, rows, missing)[0]) == -1

    def test_hash_table_matches_sorted(self, rng):
        """The scatter-built hash (the TPU fast path for rulebook
        lookups) agrees with the sorted-table reference, including
        misses and masked voxels."""
        from pointcloudpdf_tpu.ops.voxel import (
            build_hash_table, lookup_hash, pack_grid)

        grid, mask = random_voxels(rng, 500, 512, extent=12)
        keys, rows = build_table(grid, mask)
        tables = build_hash_table(grid, mask)

        g = np.asarray(grid)
        queries = np.concatenate([
            g[:400],                                   # present
            rng.randint(0, 24, (100, 3)),              # mostly absent
        ]).astype(np.int32)
        qk = pack_grid(jnp.asarray(queries))
        expect = np.asarray(lookup(keys, rows, qk))
        got = np.asarray(lookup_hash(tables, qk))
        np.testing.assert_array_equal(got, expect)

    def test_hash_table_large_capacity(self, rng):
        """Collation buckets reach 131072 slots (SphereCrop point_max
        102400 on ScanNet/nuScenes configs); the packed entry's row
        field must widen past 16 bits — a regression here was a
        trace-time assert (ADVICE r2, high)."""
        from pointcloudpdf_tpu.ops.voxel import (
            build_hash_table, lookup_hash, pack_grid)

        cap = 131072
        raw = rng.randint(0, 500, (cap + 20000, 3))
        uniq = np.unique(raw, axis=0)
        n_valid = min(len(uniq), cap - 1000)
        grid = np.zeros((cap, 3), np.int32)
        grid[:n_valid] = uniq[:n_valid]
        mask = np.zeros(cap, bool)
        mask[:n_valid] = True
        grid, mask = jnp.asarray(grid), jnp.asarray(mask)

        keys, rows = build_table(grid, mask)
        tables = build_hash_table(grid, mask)
        pick = rng.choice(n_valid, 3000, replace=False)
        queries = np.concatenate([
            np.asarray(grid)[pick],
            rng.randint(500, 700, (500, 3)),           # absent
        ]).astype(np.int32)
        qk = pack_grid(jnp.asarray(queries))
        expect = np.asarray(lookup(keys, rows, qk))
        got = np.asarray(lookup_hash(tables, qk, n_rows=cap))
        # the scatter build may park ~1e-4 of keys (documented): a miss
        # surfaces as -1, never as a wrong row
        agree = got == expect
        assert agree.mean() >= 0.999
        assert (got[~agree] == -1).all()

    def test_neighbor_table_matches_bruteforce(self, rng):
        grid, mask = random_voxels(rng, 40, 64, extent=6)
        offsets = kernel_offsets(3)
        nbr = np.asarray(neighbor_table(grid, mask, offsets))
        g = np.asarray(grid)
        for i in range(40):
            for k, off in enumerate(np.asarray(offsets)):
                target = g[i] + off
                expect = -1
                for j in range(40):
                    if np.all(g[j] == target):
                        expect = j
                        break
                assert nbr[i, k] == expect, (i, k, target)
        assert (nbr[40:] == -1).all()

    def test_unique_parents(self, rng):
        grid, mask = random_voxels(rng, 40, 64, extent=8)
        p_grid, p_mask, c2p = unique_parents(grid, mask, 2)
        p_grid, p_mask, c2p = map(np.asarray, (p_grid, p_mask, c2p))
        g = np.asarray(grid)
        expect_parents = sorted({tuple(v // 2) for v in g[:40]})
        n_p = int(p_mask.sum())
        assert n_p == len(expect_parents)
        got = [tuple(p_grid[i]) for i in range(n_p)]
        assert sorted(got) == expect_parents
        for i in range(40):
            assert tuple(p_grid[c2p[i]]) == tuple(g[i] // 2)
        assert (c2p[40:] == -1).all()

    def test_unique_parents_capacity(self, rng):
        """Shrunk static capacity: results identical while the unique
        count fits; overflowing parents drop with children flagged -1
        (the SpUNet level_capacity schedule's guard)."""
        grid, mask = random_voxels(rng, 40, 64, extent=8)
        g = np.asarray(grid)
        full = unique_parents(grid, mask, 2)
        n_unique = int(np.asarray(full[1]).sum())

        # capacity just large enough: bit-identical prefix behavior
        cap = n_unique + 2
        p_grid, p_mask, c2p = map(
            np.asarray, unique_parents(grid, mask, 2, capacity=cap))
        assert p_grid.shape == (cap, 3) and int(p_mask.sum()) == n_unique
        for i in range(40):
            assert tuple(p_grid[c2p[i]]) == tuple(g[i] // 2)

        # overflow: the smallest-key parents survive, children of dropped
        # parents map to -1 instead of aliasing a wrong slot
        cap = max(n_unique // 2, 1)
        p_grid, p_mask, c2p = map(
            np.asarray, unique_parents(grid, mask, 2, capacity=cap))
        assert int(p_mask.sum()) == cap
        kept = {tuple(p_grid[i]) for i in range(cap)}
        for i in range(40):
            parent = tuple(g[i] // 2)
            if parent in kept:
                assert tuple(p_grid[c2p[i]]) == parent
            else:
                assert c2p[i] == -1

    def test_gather_conv_matches_dense(self, rng):
        grid, mask = random_voxels(rng, 30, 32, extent=5)
        offsets = kernel_offsets(3)
        nbr = neighbor_table(grid, mask, offsets)
        feat = jnp.asarray(rng.randn(32, 4).astype(np.float32))
        feat = jnp.where(mask[:, None], feat, 0.0)
        w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32))
        # full-precision matmuls so the comparison isolates indexing bugs
        with jax.default_matmul_precision("highest"):
            out = np.asarray(jax.jit(gather_conv)(feat, nbr, w))
        nbr_np, feat_np, w_np = map(np.asarray, (nbr, feat, w))
        for i in range(30):
            expect = np.zeros(8, np.float32)
            for k in range(27):
                j = nbr_np[i, k]
                if j >= 0:
                    expect += feat_np[j] @ w_np[k]
            np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-4)


class TestSpUNet:
    def make_batch(self, rng, B=2, N=128, C=4, num_classes=5):
        coord = rng.rand(B, N, 3).astype(np.float32)
        grid = (coord / 0.08).astype(np.int32)
        feat = rng.rand(B, N, C).astype(np.float32)
        mask = np.zeros((B, N), bool)
        counts = [N, N * 3 // 4]
        seg = np.full((B, N), -1, np.int64)
        for i, c in enumerate(counts):
            mask[i, :c] = True
            seg[i, :c] = rng.randint(0, num_classes, c)
        return dict(
            grid_coord=jnp.asarray(grid),
            coord=jnp.asarray(coord),
            feat=jnp.asarray(feat),
            mask=jnp.asarray(mask),
            segment=jnp.asarray(seg),
        )

    @pytest.fixture(scope="class")
    def small_cfg(self):
        return dict(
            type="SpUNet-v1m1",
            in_channels=4,
            num_classes=5,
            base_channels=8,
            channels=(8, 16, 16, 8),
            layers=(1, 1, 1, 1),
        )

    def test_seg_forward(self, rng, small_cfg):
        model = build_model(dict(small_cfg))
        batch = self.make_batch(rng)
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(model, variables, batch, train=False)
        assert out.shape == (2, 128, 5)
        assert np.isfinite(np.asarray(out)).all()
        # padded rows are zeroed
        assert np.allclose(np.asarray(out)[1, 96:], 0.0)

    def test_cls_forward(self, rng, small_cfg):
        cfg = dict(small_cfg, cls_mode=True, num_classes=7)
        model = build_model(cfg)
        batch = self.make_batch(rng)
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(model, variables, batch, train=False)
        assert out.shape == (2, 7)
        assert np.isfinite(np.asarray(out)).all()

    def test_grad_flows(self, rng, small_cfg):
        model = build_model(dict(small_cfg))
        batch = self.make_batch(rng)
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=True)

        @jax.jit
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
            )
            logits = out
            m = batch["mask"][..., None]
            return jnp.sum(jnp.where(m, logits, 0.0) ** 2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0


class TestPDNormSpUNet:
    """SpUNet-v1m3: per-condition decoupled PDNorm (+ adaptive context)."""

    def make_batch(self, rng, B=2, N=64, C=4):
        coord = rng.rand(B, N, 3).astype(np.float32)
        mask = np.ones((B, N), bool)
        return dict(
            grid_coord=jnp.asarray((coord / 0.1).astype(np.int32)),
            coord=jnp.asarray(coord),
            feat=jnp.asarray(rng.rand(B, N, C).astype(np.float32)),
            mask=jnp.asarray(mask),
        )

    @pytest.fixture(scope="class")
    def cfg(self):
        return dict(
            type="SpUNet-v1m3",
            in_channels=4,
            num_classes=5,
            base_channels=8,
            channels=(8, 16, 16, 8),
            layers=(1, 1, 1, 1),
            conditions=("ScanNet", "S3DIS"),
            norm_decouple=True,
            norm_adaptive=True,
            context_channels=16,
        )

    def test_stacked_banks_and_condition_select(self, rng, cfg):
        model = build_model(dict(cfg))
        batch = self.make_batch(rng)
        batch["context"] = jnp.asarray(rng.rand(16).astype(np.float32))
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False, condition="ScanNet")
        # stacked (n_cond, C) banks: every BN scale has leading dim 2
        flat = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
        assert flat and all(g.shape[0] == 2 for _, g in flat)
        out_sc = jit_apply(model, variables, batch, train=False,
                           condition="ScanNet")
        out_s3 = jit_apply(model, variables, batch, train=False,
                           condition="S3DIS")
        assert out_sc.shape == (2, 64, 5)
        assert np.isfinite(np.asarray(out_sc)).all()
        # adaptive modulation is zero-init -> both start identical; after
        # perturbing only ScanNet's bank they must diverge
        np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_s3),
                                   rtol=1e-5, atol=1e-6)
        stats = jax.tree_util.tree_map(
            lambda v: v.at[0].set(v[0] + 0.5) if v.shape[0] == 2 else v,
            variables["batch_stats"],
        )
        out_sc2 = jit_apply(model, {**variables, "batch_stats": stats},
                            batch, train=False, condition="ScanNet")
        out_s32 = jit_apply(model, {**variables, "batch_stats": stats},
                            batch, train=False, condition="S3DIS")
        assert not np.allclose(np.asarray(out_sc2), np.asarray(out_sc))
        np.testing.assert_allclose(np.asarray(out_s32), np.asarray(out_s3),
                                   rtol=1e-5, atol=1e-6)

    def test_train_updates_only_active_condition(self, rng, cfg):
        model = build_model(dict(cfg))
        batch = self.make_batch(rng)
        batch["context"] = jnp.asarray(rng.rand(16).astype(np.float32))
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=True, condition="ScanNet")
        _, mutated = jax.jit(
            lambda v, b: model.apply(v, b, train=True,
                                     mutable=["batch_stats"],
                                     condition="ScanNet")
        )(variables, batch)
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed_active = any(
            not np.allclose(np.asarray(a[0]), np.asarray(b0[0]))
            for a, b0 in zip(after, before)
        )
        inactive_frozen = all(
            np.allclose(np.asarray(a[1]), np.asarray(b0[1]))
            for a, b0 in zip(after, before)
        )
        assert changed_active and inactive_frozen


class TestMinkBottleneck:
    def test_minkunet50_forward(self, rng):
        model = build_model(
            dict(
                type="MinkUNet50",
                in_channels=4,
                num_classes=5,
                base_channels=8,
                channels=(8, 16, 16, 8),
                layers=(1, 1, 1, 1),
            )
        )
        coord = rng.rand(2, 64, 3).astype(np.float32)
        batch = dict(
            grid_coord=jnp.asarray((coord / 0.1).astype(np.int32)),
            coord=jnp.asarray(coord),
            feat=jnp.asarray(rng.rand(2, 64, 4).astype(np.float32)),
            mask=jnp.asarray(np.ones((2, 64), bool)),
        )
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                             train=False)
        out = jit_apply(model, variables, batch, train=False)
        assert out.shape == (2, 64, 5)
        assert np.isfinite(np.asarray(out)).all()
        # bottleneck blocks present: conv3 (the 1x1 expansion) in params
        names = [str(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])]
        assert any("conv3" in s for s in names)
