"""Fused Pallas vector attention vs the unfused jnp path.

The kernel (ops/pallas_attention.py) must reproduce the inference
forward of PointTransformerLayer exactly (same params, same masking) —
interpreter mode runs the kernel on CPU so the equivalence is asserted
in the suite; on-chip recall/perf is asserted by bench.py.
"""

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
    return layer, Points(coord, feat, mask)


def _init_and_ref(layer, pts):
    old = ptmod.FUSED_ATTENTION
    ptmod.FUSED_ATTENTION = "off"
    try:
        variables = jax.jit(
            lambda: layer.init(jax.random.PRNGKey(7), pts, True)
        )()
        ref = jax.jit(
            lambda v: layer.apply(v, pts, False)
        )(variables)
    finally:
        ptmod.FUSED_ATTENTION = old
    return variables, ref


def test_fused_matches_unfused(layer_setup):
    """f32 payload: the fused chain must match the unfused path tightly
    (the only difference is evaluation order)."""
    layer, pts = layer_setup
    variables, ref = _init_and_ref(layer, pts)

    old = ptmod.FUSED_ATTENTION
    old_dt = ptmod.FUSED_PAYLOAD_DTYPE
    ptmod.FUSED_ATTENTION = "interpret"
    ptmod.FUSED_PAYLOAD_DTYPE = "float32"
    try:
        out = jax.jit(lambda v: layer.apply(v, pts, False))(variables)
    finally:
        ptmod.FUSED_ATTENTION = old
        ptmod.FUSED_PAYLOAD_DTYPE = old_dt

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_bf16_payload_close(layer_setup):
    """The default bf16 [k|v] payload (halved HBM bytes) must stay
    within bf16 rounding of the unfused f32 path: relative positions
    are computed in f32 BEFORE the cast, so only the k/v features carry
    the ~2^-8 quantization."""
    layer, pts = layer_setup
    variables, ref = _init_and_ref(layer, pts)

    assert ptmod.FUSED_PAYLOAD_DTYPE == "bfloat16"  # the shipped default
    old = ptmod.FUSED_ATTENTION
    ptmod.FUSED_ATTENTION = "interpret"
    try:
        out = jax.jit(lambda v: layer.apply(v, pts, False))(variables)
    finally:
        ptmod.FUSED_ATTENTION = old

    ref_h, out_h = np.asarray(ref), np.asarray(out)
    scale = np.abs(ref_h).max() + 1e-9
    rel = np.abs(out_h - ref_h) / scale
    assert float(np.quantile(rel, 0.999)) < 2e-2, float(rel.max())
    assert np.all(np.isfinite(out_h))


def test_fused_param_tree_identical(layer_setup):
    layer, pts = layer_setup
    old = ptmod.FUSED_ATTENTION
    ptmod.FUSED_ATTENTION = "off"
    try:
        v_off = jax.jit(
            lambda: layer.init(jax.random.PRNGKey(7), pts, True)
        )()
    finally:
        ptmod.FUSED_ATTENTION = old

    # eval-init through the fused path must create the same tree
    ptmod.FUSED_ATTENTION = "interpret"
    try:
        v_fused = jax.jit(
            lambda: layer.init(jax.random.PRNGKey(7), pts, False)
        )()
    finally:
        ptmod.FUSED_ATTENTION = old

    flat_off = jax.tree_util.tree_structure(v_off)
    flat_fused = jax.tree_util.tree_structure(v_fused)
    assert flat_off == flat_fused
    for (ka, a), (kb, bb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(v_off),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(v_fused),
               key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        assert a.shape == bb.shape, (ka, a.shape, bb.shape)


def test_fused_masked_rows_zero(layer_setup):
    """Query-invalid rows are zeroed; masked neighbor slots contribute 0."""
    layer, pts = layer_setup
    variables, _ = _init_and_ref(layer, pts)
    old = ptmod.FUSED_ATTENTION
    ptmod.FUSED_ATTENTION = "interpret"
    try:
        out = jax.jit(lambda v: layer.apply(v, pts, False))(variables)
    finally:
        ptmod.FUSED_ATTENTION = old
    invalid = ~np.asarray(pts.mask)
    assert np.all(np.asarray(out)[invalid] == 0.0)
    assert np.all(np.isfinite(np.asarray(out)))
