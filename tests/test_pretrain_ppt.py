"""MSC pretraining, CAC, and PPT model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model

TINY_SPUNET = dict(
    type="SpUNet-v1m1", in_channels=6, num_classes=0,
    base_channels=8, channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
)


def test_msc_forward_loss():
    model = build_model(
        dict(
            type="MSC-v1m1",
            backbone=dict(TINY_SPUNET),
            backbone_in_channels=6,
            backbone_out_channels=8,
            mask_grid_size=0.2,
            mask_rate=0.4,
            matching_max_radius=0.1,
            matching_max_pair=64,
            reconstruct_color=True,
            reconstruct_normal=True,
        )
    )
    rng = np.random.RandomState(0)
    B, N = 2, 64

    def view(prefix):
        coord = rng.rand(B, N, 3).astype(np.float32)
        return {
            f"{prefix}_origin_coord": jnp.asarray(coord),
            f"{prefix}_coord": jnp.asarray(coord + 0.01),
            f"{prefix}_grid_coord": jnp.asarray((coord / 0.05).astype(np.int32)),
            f"{prefix}_feat": jnp.asarray(rng.rand(B, N, 6).astype(np.float32)),
            f"{prefix}_color": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
            f"{prefix}_normal": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        }

    batch = dict(mask=jnp.ones((B, N), bool), **view("view1"), **view("view2"))
    # views share origin coords so pairs match within the radius
    batch["view2_origin_coord"] = batch["view1_origin_coord"]
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    out = jit_apply(
        model, variables, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )[0]
    for key in ("loss", "nce_loss", "color_loss", "normal_loss"):
        assert np.isfinite(float(out[key])), key


def test_cac_eval_path():
    model = build_model(
        dict(
            type="CAC-v1m1", num_classes=5, backbone_out_channels=8,
            backbone=dict(TINY_SPUNET),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        )
    )
    rng = np.random.RandomState(0)
    batch = dict(
        coord=jnp.asarray(rng.rand(2, 64, 3).astype(np.float32)),
        grid_coord=jnp.asarray((rng.rand(2, 64, 3) * 20).astype(np.int32)),
        feat=jnp.asarray(rng.rand(2, 64, 6).astype(np.float32)),
        mask=jnp.ones((2, 64), bool),
        segment=jnp.asarray(rng.randint(0, 5, (2, 64))),
    )
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, batch,
                         train=True)
    out = jit_apply(model, variables, batch, train=False)
    assert out["seg_logits"].shape == (2, 64, 5)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()


def test_ppt_conditions_compile_separately():
    model = build_model(
        dict(
            type="PPT-v1m1",
            backbone=dict(TINY_SPUNET, type="SpUNet-v1m3"),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            backbone_out_channels=8,
            context_channels=16,
            conditions=("Structured3D", "ScanNet", "S3DIS"),
            embed_channels=32,
        )
    )
    rng = np.random.RandomState(0)
    batch = dict(
        coord=jnp.asarray(rng.rand(2, 64, 3).astype(np.float32)),
        grid_coord=jnp.asarray((rng.rand(2, 64, 3) * 20).astype(np.int32)),
        feat=jnp.asarray(rng.rand(2, 64, 6).astype(np.float32)),
        mask=jnp.ones((2, 64), bool),
        segment=jnp.asarray(rng.randint(0, 5, (2, 64))),
    )
    import functools

    variables = jax.jit(
        functools.partial(model.init, train=True, condition="ScanNet")
    )({"params": jax.random.PRNGKey(0)}, batch)
    out_sc = jax.jit(
        functools.partial(model.apply, train=False, condition="ScanNet")
    )(variables, batch)
    out_s3 = jax.jit(
        functools.partial(model.apply, train=False, condition="S3DIS")
    )(variables, batch)
    assert out_sc["seg_logits"].shape[-1] == 20   # ScanNet valid classes
    assert out_s3["seg_logits"].shape[-1] == 13   # S3DIS valid classes
    assert np.isfinite(float(out_sc["loss"]))


def test_ppt_v1m2_decoupled_heads():
    model = build_model(
        dict(
            type="PPT-v1m2",
            backbone=dict(
                TINY_SPUNET, type="SpUNet-v1m3",
                conditions=("Structured3D", "ScanNet", "S3DIS"),
                norm_adaptive=True, context_channels=16,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
            backbone_out_channels=8,
            context_channels=16,
            conditions=("Structured3D", "ScanNet", "S3DIS"),
            num_classes=(25, 20, 13),
        )
    )
    rng = np.random.RandomState(0)
    batch = dict(
        coord=jnp.asarray(rng.rand(2, 64, 3).astype(np.float32)),
        grid_coord=jnp.asarray((rng.rand(2, 64, 3) * 20).astype(np.int32)),
        feat=jnp.asarray(rng.rand(2, 64, 6).astype(np.float32)),
        mask=jnp.ones((2, 64), bool),
        segment=jnp.asarray(rng.randint(0, 5, (2, 64))),
    )
    import functools

    variables = jax.jit(
        functools.partial(model.init, train=True, condition="ScanNet")
    )({"params": jax.random.PRNGKey(0)}, batch)
    out_sc = jax.jit(
        functools.partial(model.apply, train=False, condition="ScanNet")
    )(variables, batch)
    out_s3 = jax.jit(
        functools.partial(model.apply, train=False, condition="S3DIS")
    )(variables, batch)
    assert out_sc["seg_logits"].shape == (2, 64, 20)
    assert out_s3["seg_logits"].shape == (2, 64, 13)
    assert np.isfinite(float(out_sc["loss"]))
    # decoupled heads exist for every condition
    names = [str(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("seg_head_0" in s for s in names)
    assert any("seg_head_2" in s for s in names)


def test_ptv2m3_pdnorm_conditions():
    model = build_model(
        dict(
            type="PT-v2m3",
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
            conditions=("ScanNet", "S3DIS"),
            norm_adaptive=False,
        )
    )
    rng = np.random.RandomState(0)
    batch = dict(
        coord=jnp.asarray(rng.rand(2, 48, 3).astype(np.float32)),
        feat=jnp.asarray(rng.rand(2, 48, 6).astype(np.float32)),
        mask=jnp.ones((2, 48), bool),
    )
    import functools

    variables = jax.jit(
        functools.partial(model.init, train=False, condition="ScanNet")
    )({"params": jax.random.PRNGKey(0)}, batch)
    # PDNorm banks are stacked per condition
    stats = jax.tree_util.tree_leaves(variables["batch_stats"])
    assert stats and all(s.shape[0] == 2 for s in stats)
    out = jax.jit(
        functools.partial(model.apply, train=False, condition="S3DIS")
    )(variables, batch)
    assert out.shape == (2, 48, 5)
    assert np.isfinite(np.asarray(out)).all()
