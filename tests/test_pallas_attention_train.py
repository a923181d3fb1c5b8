"""Fused Pallas vector attention TRAINING path vs the unfused jnp path.

Forward AND backward, per the reference's own kernel-verification
template (/root/reference/libs/pointops2/functions/test_attention_op_step1.py:1-40
compares a custom CUDA op against a torch_scatter composition both ways).
Here the fused path is ops/pallas_attention.py's custom-VJP'd kernel with
XLA-side masked BN batch stats; the reference path is the unfused
PointTransformerLayer jnp chain.  Interpreter mode runs the kernels on
CPU.  Checked: outputs, updated BN running statistics, gradients w.r.t.
every parameter and the input features.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudpdf_tpu.models.point_transformer import modules as ptmod
from pointcloudpdf_tpu.models.utils.structure import Points


@pytest.fixture()
def layer_setup():
    rng = jax.random.PRNGKey(0)
    b, n, c = 2, 64, 32
    coord = jax.random.uniform(rng, (b, n, 3), jnp.float32)
    feat = jax.random.normal(jax.random.fold_in(rng, 1), (b, n, c))
    mask = jnp.arange(n)[None, :] < jnp.array([n, n - 17])[:, None]
    layer = ptmod.PointTransformerLayer(c, c, share_planes=8, nsample=8)
    return layer, coord, feat, mask


def _with_mode(mode, fn, payload_dtype="float32"):
    """Pin the payload dtype to f32 by default: these tests assert the
    fused-train machinery against the unfused f32 path to tight bounds;
    the shipped bf16 default is covered by its own tolerance test."""
    old = ptmod.FUSED_ATTENTION
    old_dt = ptmod.FUSED_PAYLOAD_DTYPE
    ptmod.FUSED_ATTENTION = mode
    ptmod.FUSED_PAYLOAD_DTYPE = payload_dtype
    try:
        return fn()
    finally:
        ptmod.FUSED_ATTENTION = old
        ptmod.FUSED_PAYLOAD_DTYPE = old_dt


def _init(layer, pts):
    return _with_mode("off", lambda: jax.jit(
        lambda: layer.init(jax.random.PRNGKey(7), pts, True))())


def test_train_forward_and_stats_match(layer_setup):
    layer, coord, feat, mask = layer_setup
    pts = Points(coord, feat, mask)
    variables = _init(layer, pts)

    def apply_train(v):
        return layer.apply(v, pts, True, mutable=["batch_stats"])

    ref, ref_mut = _with_mode(
        "off", lambda: jax.jit(apply_train)(variables))
    out, mut = _with_mode(
        "interpret", lambda: jax.jit(apply_train)(variables))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
    # BN running statistics must update identically (masked batch stats)
    ref_leaves = jax.tree_util.tree_leaves_with_path(
        ref_mut["batch_stats"])
    fused_leaves = jax.tree_util.tree_leaves_with_path(
        mut["batch_stats"])
    assert len(ref_leaves) == len(fused_leaves) > 0
    for (ka, a), (kb, bb) in zip(
        sorted(ref_leaves, key=lambda t: str(t[0])),
        sorted(fused_leaves, key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=str(ka))


def test_train_grads_match(layer_setup):
    """Gradients w.r.t. all params and the input features, fused vs
    unfused — including the BN batch-stat coupling terms (grads through
    the masked mean/var), which the fused path routes through autodiff
    of the XLA-side stats."""
    layer, coord, feat, mask = layer_setup
    pts = Points(coord, feat, mask)
    variables = _init(layer, pts)
    wvec = jax.random.normal(jax.random.PRNGKey(3), feat.shape[:2] + (32,))

    def loss_fn(params, f):
        out, _ = layer.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            Points(coord, f, mask), True, mutable=["batch_stats"])
        return jnp.sum(out * wvec)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    gp_ref, gf_ref = _with_mode(
        "off", lambda: grad_fn(variables["params"], feat))
    # fresh jit: the trace cache would not re-read the mode global
    grad_fn2 = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    gp_fused, gf_fused = _with_mode(
        "interpret", lambda: grad_fn2(variables["params"], feat))

    # atol rides the GLOBAL grad magnitude: tiny leaves (e.g. the p1 bias
    # grad, a cancellation-dominated sum of thousands of terms) carry
    # absolute rounding noise proportional to the large activations that
    # produced them, not to their own near-zero value
    gscale = max(float(np.abs(np.asarray(l)).max())
                 for l in jax.tree_util.tree_leaves(gp_ref))
    for (ka, a), (kb, bb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp_ref),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gp_fused),
               key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=5e-3, atol=2e-3 * gscale,
            err_msg=str(ka))
    np.testing.assert_allclose(
        np.asarray(gf_fused), np.asarray(gf_ref),
        rtol=5e-3, atol=2e-3 * gscale)


def test_train_masked_rows_zero_grad(layer_setup):
    """Invalid query rows produce zero output; grads w.r.t. features of
    fully-masked points only flow through the BN batch statistics of
    valid slots (i.e. no NaNs, finite everywhere)."""
    layer, coord, feat, mask = layer_setup
    pts = Points(coord, feat, mask)
    variables = _init(layer, pts)

    def apply_train(v):
        return layer.apply(v, pts, True, mutable=["batch_stats"])

    out, _ = _with_mode("interpret", lambda: jax.jit(apply_train)(variables))
    invalid = ~np.asarray(mask)
    assert np.all(np.asarray(out)[invalid] == 0.0)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss_fn(f):
        o, _ = layer.apply(variables, Points(coord, f, mask), True,
                           mutable=["batch_stats"])
        return jnp.sum(o ** 2)

    g = _with_mode("interpret", lambda: jax.jit(jax.grad(loss_fn))(feat))
    assert np.all(np.isfinite(np.asarray(g)))


def test_train_bf16_payload_close(layer_setup):
    """The shipped bf16 train payload (halved HBM bytes for payload,
    VJP residual and dg) must stay within bf16 rounding of the f32
    unfused path — outputs AND gradients: k/v features carry ~2^-8
    quantization, coords recombine exactly via the hi/lo split."""
    layer, coord, feat, mask = layer_setup
    pts = Points(coord, feat, mask)
    variables = _init(layer, pts)
    wvec = jax.random.normal(jax.random.PRNGKey(3), feat.shape[:2] + (32,))

    def loss_fn(params, f):
        out, _ = layer.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            Points(coord, f, mask), True, mutable=["batch_stats"])
        return jnp.sum(out * wvec), out

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=1,
                                         has_aux=True))
    (_, ref), gf_ref = _with_mode(
        "off", lambda: grad_fn(variables["params"], feat))
    grad_fn2 = jax.jit(jax.value_and_grad(loss_fn, argnums=1,
                                          has_aux=True))
    (_, out), gf = _with_mode(
        "interpret", lambda: grad_fn2(variables["params"], feat),
        payload_dtype="bfloat16")

    for got, want in ((out, ref), (gf, gf_ref)):
        got, want = np.asarray(got), np.asarray(want)
        assert np.all(np.isfinite(got))
        rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
        assert float(np.quantile(rel, 0.999)) < 2e-2, float(rel.max())
