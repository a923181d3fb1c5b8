"""End-to-end bounds for the approximation stack (VERDICT r2 item 5).

Each TPU fast path trades exactness for speed: the serialization-window
kNN (~0.97-0.99 recall), the approx-top-k unit (~0.997), and the
scatter-built voxel hash (~1e-4 parked keys).  Their *op-level* errors
are tested elsewhere; these tests bound the *end-to-end* effect on a
trained model's predictions — the contract a user actually cares about:

- the same trained PT-v1 evaluated through exact vs serialization-window
  kNN must agree on >= 98% of argmax predictions with |mIoU delta| <=
  0.02 (the serial path is the dispatch for >131k-point eval fragments);
- SpUNet through the hash-built neighbor tables vs exact sorted-table
  lookups at adversarial hash load must agree on >= 99.5% of argmax
  predictions.

Stated bound (also in BASELINE.md): approximation error changes <= 2% of
predictions end-to-end, an order below typical val mIoU noise.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.ops import geometry


def quadrant_scene(rng, n, scale=2.0):
    coord = rng.rand(n, 3).astype(np.float32) * scale
    seg = ((coord[:, 0] > scale / 2).astype(np.int64) * 2
           + (coord[:, 1] > scale / 2).astype(np.int64))
    feat = np.concatenate([coord, coord / scale], axis=-1).astype(np.float32)
    return coord, feat, seg


def miou(pred, seg, num_classes=4):
    ious = []
    for c in range(num_classes):
        inter = np.sum((pred == c) & (seg == c))
        union = np.sum((pred == c) | (seg == c))
        if union:
            ious.append(inter / union)
    return float(np.mean(ious))


@pytest.fixture(scope="module")
def trained_ptv1():
    """PT-v1 Seg26 trained to separate the quadrant toy task."""
    import optax

    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                      num_classes=4),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    rng = np.random.RandomState(0)
    coord, feat, seg = quadrant_scene(rng, 1024)
    batch = dict(coord=jnp.asarray(coord[None]), feat=jnp.asarray(feat[None]),
                 mask=jnp.ones((1, 1024), bool))
    seg_j = jnp.asarray(seg[None])
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    tx = optax.adamw(2e-2)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, batch, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return model.loss(out["seg_logits"], seg_j), mut["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats2, opt_state, loss

    for _ in range(60):
        params, stats, opt_state, loss = step(params, stats, opt_state)
    assert float(loss) < 0.5, f"toy training failed to converge: {loss}"
    return model, {"params": params, "batch_stats": stats}


class TestKnnPathParity:
    def _predict(self, model, variables, batch, path):
        old = geometry.FORCE_KNN_PATH
        geometry.FORCE_KNN_PATH = path
        try:
            # fresh callable per path: FORCE_KNN_PATH binds at trace time
            def fwd(variables, batch):
                out = model.apply(variables, batch, train=False)
                return jnp.argmax(out["seg_logits"], axis=-1)

            return np.asarray(jax.jit(fwd)(variables, batch))[0]
        finally:
            geometry.FORCE_KNN_PATH = old

    def test_serial_vs_exact_end_to_end(self, trained_ptv1):
        """The >131k-fragment dispatch path, bounded on a trained model
        (ADVICE r2 low: knn_serial recall was only measured op-level)."""
        model, variables = trained_ptv1
        rng = np.random.RandomState(7)
        n = 16384  # large enough for real window truncation behavior
        coord, feat, seg = quadrant_scene(rng, n)
        batch = dict(coord=jnp.asarray(coord[None]),
                     feat=jnp.asarray(feat[None]),
                     mask=jnp.ones((1, n), bool))

        pred_exact = self._predict(model, variables, batch, "exact")
        pred_serial = self._predict(model, variables, batch, "serial")

        agree = float(np.mean(pred_exact == pred_serial))
        d_miou = abs(miou(pred_exact, seg) - miou(pred_serial, seg))
        assert agree >= 0.98, f"serial kNN changed {1-agree:.2%} of preds"
        assert d_miou <= 0.02, f"serial kNN moved mIoU by {d_miou:.4f}"

    def test_approx_vs_exact_end_to_end(self, trained_ptv1):
        """The TPU approx-top-k dispatch, same bound."""
        model, variables = trained_ptv1
        rng = np.random.RandomState(8)
        n = 8192
        coord, feat, seg = quadrant_scene(rng, n)
        batch = dict(coord=jnp.asarray(coord[None]),
                     feat=jnp.asarray(feat[None]),
                     mask=jnp.ones((1, n), bool))
        pred_exact = self._predict(model, variables, batch, "exact")
        pred_approx = self._predict(model, variables, batch, "approx")
        agree = float(np.mean(pred_exact == pred_approx))
        d_miou = abs(miou(pred_exact, seg) - miou(pred_approx, seg))
        assert agree >= 0.98, f"approx kNN changed {1-agree:.2%} of preds"
        assert d_miou <= 0.02, f"approx kNN moved mIoU by {d_miou:.4f}"


class TestVoxelHashAdversarial:
    def test_spunet_hash_vs_exact_tables(self, monkeypatch):
        """SpUNet argmax parity when every neighbor table is built by the
        exact sorted-key lookup instead of the scatter hash, on a dense
        cube (maximum 27-probe hit rate -> worst case for tag collisions
        and parked keys)."""
        from pointcloudpdf_tpu.models.sparse_unet import spconv_unet
        from pointcloudpdf_tpu.ops import voxel

        def neighbor_table_exact(grid, mask, offsets):
            keys, rows = voxel.build_table(grid, mask)
            n, k = grid.shape[0], offsets.shape[0]
            q_grid = grid[:, None, :] + offsets[None, :, :]
            in_bounds = jnp.all(q_grid >= 0, axis=-1)
            q_keys = jnp.where(
                in_bounds & mask[:, None],
                voxel.pack_grid(jnp.maximum(q_grid, 0)),
                jnp.uint32(0xFFFFFFFF)).reshape(-1)
            nbr = voxel.lookup(keys, rows, q_keys).reshape(n, k)
            return jnp.where(mask[:, None] & in_bounds, nbr, -1)

        import optax

        model = build_model(dict(
            type="DefaultSegmentor",
            backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=4,
                          base_channels=8, channels=(8,) * 8,
                          layers=(1,) * 8),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        ))
        rng = np.random.RandomState(3)
        n = 8192
        # dense cube, UNIQUE cells (GridSample dedups before the model;
        # duplicate keys have no defined representative): 21^3 = 9261
        # cells, 88% occupied -> worst-case 27-probe hit rate
        cells = rng.choice(21 ** 3, n, replace=False)
        grid = np.stack(np.unravel_index(cells, (21, 21, 21)), 1)
        grid = grid.astype(np.int32)
        coord = grid.astype(np.float32) * 0.02
        seg = ((grid[:, 0] > 10).astype(np.int64) * 2
               + (grid[:, 1] > 10).astype(np.int64))
        batch = dict(
            grid_coord=jnp.asarray(grid[None]),
            coord=jnp.asarray(coord[None]),
            feat=jnp.asarray(np.concatenate(
                [coord, coord], -1)[None].astype(np.float32)),
            mask=jnp.ones((1, n), bool),
        )
        seg_j = jnp.asarray(seg[None])
        variables = jax.jit(functools.partial(model.init, train=True))(
            {"params": jax.random.PRNGKey(0)}, batch)

        # brief training: a random-init net's argmax is knife-edge and
        # amplifies any perturbation; the bound is about TRAINED models
        tx = optax.adamw(2e-2)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, batch,
                    train=True, mutable=["batch_stats"])
                return (model.loss(out["seg_logits"], seg_j),
                        mut["batch_stats"])

            (loss, stats2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), stats2,
                    opt_state, loss)

        for _ in range(30):
            params, stats, opt_state, loss = step(params, stats, opt_state)
        assert float(loss) < 0.7, f"toy SpUNet failed to train: {loss}"
        variables = {"params": params, "batch_stats": stats}

        def predict():
            def fwd(variables, batch):
                out = model.apply(variables, batch, train=False)
                return jnp.argmax(out["seg_logits"], axis=-1)

            return np.asarray(jax.jit(fwd)(variables, batch))[0]

        pred_hash = predict()
        monkeypatch.setattr(spconv_unet, "neighbor_table",
                            neighbor_table_exact)
        pred_exact = predict()
        agree = float(np.mean(pred_hash == pred_exact))
        assert agree >= 0.995, (
            f"voxel hash changed {1-agree:.3%} of SpUNet predictions")


class TestSTKernelStack:
    """Model-level bound for the two ST Pallas fast paths (round 3):
    fused window attention (exact semantics, bf16-rounded matmuls) and
    the two-pass sorted-band KPConv stem (union band, ~0.06% residual
    in-radius pair misses).  The contract mirrors the kNN bounds above:
    a TRAINED model's argmax predictions move by <= 2%."""

    @pytest.fixture(scope="class")
    def trained_st(self):
        import optax

        from pointcloudpdf_tpu.models.stratified_transformer import st as stm

        model = build_model(dict(
            type="DefaultSegmentor",
            backbone=dict(
                type="ST-v1m1", downsample_scale=4, depths=[1, 2],
                channels=[16, 32], num_heads=[2, 4],
                window_size=[0.4, 0.8], up_k=3, grid_sizes=[0.1, 0.2],
                quant_sizes=[0.02, 0.04], rel_query=True, rel_key=True,
                rel_value=True, drop_path_rate=0.0, num_layers=2,
                num_classes=4, ratio=0.25, k=8, prev_grid_size=0.1,
                sigma=1.0, stem_transformer=False, kp_ball_radius=0.25,
                kp_max_neighbor=24,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        ))
        rng = np.random.RandomState(0)
        n = 768
        coord, feat, seg = quadrant_scene(rng, n)
        batch = dict(coord=jnp.asarray(coord[None]),
                     feat=jnp.asarray(feat[None]),
                     mask=jnp.ones((1, n), bool))
        seg_j = jnp.asarray(seg[None])

        old = stm.FUSED_ST_ATTENTION, stm.FUSED_KPCONV
        stm.FUSED_ST_ATTENTION = stm.FUSED_KPCONV = "off"
        try:
            variables = jax.jit(functools.partial(model.init, train=True))(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, batch)
            tx = optax.adamw(2e-2)
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            opt_state = tx.init(params)

            @jax.jit
            def step(params, stats, opt_state):
                def loss_fn(p):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": stats}, batch,
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(2)})
                    return (model.loss(out["seg_logits"], seg_j),
                            mut["batch_stats"])

                (loss, stats2), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), stats2,
                        opt_state, loss)

            for _ in range(40):
                params, stats, opt_state, loss = step(
                    params, stats, opt_state)
            assert float(loss) < 0.7, f"toy ST failed to converge: {loss}"
        finally:
            stm.FUSED_ST_ATTENTION, stm.FUSED_KPCONV = old
        return model, {"params": params, "batch_stats": stats}, batch, seg

    def _predict(self, model, variables, batch, mode):
        from pointcloudpdf_tpu.models.stratified_transformer import st as stm

        old = stm.FUSED_ST_ATTENTION, stm.FUSED_KPCONV
        stm.FUSED_ST_ATTENTION = stm.FUSED_KPCONV = mode
        try:
            def fwd(variables, batch):
                out = model.apply(variables, batch, train=False)
                return jnp.argmax(out["seg_logits"], axis=-1)

            return np.asarray(jax.jit(fwd)(variables, batch))[0]
        finally:
            stm.FUSED_ST_ATTENTION, stm.FUSED_KPCONV = old

    def test_fused_kernels_end_to_end(self, trained_st):
        model, variables, batch, seg = trained_st
        pred_xla = self._predict(model, variables, batch, "off")
        pred_fused = self._predict(model, variables, batch, "interpret")
        agree = float(np.mean(pred_xla == pred_fused))
        d_miou = abs(miou(pred_xla, seg) - miou(pred_fused, seg))
        assert agree >= 0.98, f"ST kernels changed {1-agree:.2%} of preds"
        assert d_miou <= 0.02, f"ST kernels moved mIoU by {d_miou:.4f}"


class TestGVAKernel:
    """Model-level bound for the PT-v2 fused GVA kernel: a TRAINED
    model's argmax predictions move <= 2% between the XLA and Pallas
    paths (same contract as the ST kernel stack above)."""

    def test_fused_gva_end_to_end(self):
        import optax

        from pointcloudpdf_tpu.models.point_transformer_v2 import ptv2 as pv2

        model = build_model(dict(
            type="DefaultSegmentor",
            backbone=dict(
                type="PT-v2m2", in_channels=6, num_classes=4,
                patch_embed_depth=1, patch_embed_channels=16,
                patch_embed_groups=4, patch_embed_neighbours=8,
                enc_depths=(1, 1), enc_channels=(16, 32),
                enc_groups=(4, 8), enc_neighbours=(8, 8),
                dec_depths=(1, 1), dec_channels=(16, 16),
                dec_groups=(4, 4), dec_neighbours=(8, 8),
                grid_sizes=(0.24, 0.48), drop_path_rate=0.0,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        ))
        rng = np.random.RandomState(0)
        n = 768
        coord, feat, seg = quadrant_scene(rng, n)
        batch = dict(coord=jnp.asarray(coord[None]),
                     feat=jnp.asarray(feat[None]),
                     mask=jnp.ones((1, n), bool))
        seg_j = jnp.asarray(seg[None])

        old = pv2.FUSED_GVA
        pv2.FUSED_GVA = "off"
        try:
            variables = jax.jit(functools.partial(model.init, train=True))(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, batch)
            tx = optax.adamw(2e-2)
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            opt_state = tx.init(params)

            @jax.jit
            def step(params, stats, opt_state):
                def loss_fn(p):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": stats}, batch,
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(2)})
                    return (model.loss(out["seg_logits"], seg_j),
                            mut["batch_stats"])

                (loss, stats2), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), stats2,
                        opt_state, loss)

            for _ in range(40):
                params, stats, opt_state, loss = step(
                    params, stats, opt_state)
            assert float(loss) < 0.7, f"toy PT-v2 failed to converge: {loss}"
            v = {"params": params, "batch_stats": stats}

            def predict(mode):
                pv2.FUSED_GVA = mode

                def fwd(v, batch):
                    out = model.apply(v, batch, train=False)
                    return jnp.argmax(out["seg_logits"], axis=-1)

                return np.asarray(jax.jit(fwd)(v, batch))[0]

            pred_xla = predict("off")
            pred_fused = predict("interpret")
        finally:
            pv2.FUSED_GVA = old
        agree = float(np.mean(pred_xla == pred_fused))
        d_miou = abs(miou(pred_xla, seg) - miou(pred_fused, seg))
        assert agree >= 0.98, f"GVA kernel changed {1-agree:.2%} of preds"
        assert d_miou <= 0.02, f"GVA kernel moved mIoU by {d_miou:.4f}"
