"""Fused Pallas PT-v2 grouped vector attention vs the XLA einsum path.

Interpret mode emulates the MXU in bf16 — relative tolerances; the
structural agreement (pe branches, masking, softmax, group-blocked
aggregation) is what these tests pin down.  On-chip agreement is
asserted at bench time (bench_ptv2 runs the kernel live).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.models.point_transformer_v2 import ptv2 as m
from conftest import jit_apply, jit_init


def _mk(rng, b=2, n=96, s=8, c=32):
    coord = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    feat = jnp.asarray(rng.rand(b, n, c).astype(np.float32) - 0.5)
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    idx = jnp.asarray(rng.randint(0, n, (b, n, s)).astype(np.int32))
    rmask = jnp.asarray(rng.rand(b, n, s) > 0.2)
    return feat, coord, idx, rmask, mask


@pytest.mark.parametrize("pe", [(False, True), (True, True), (True, False)])
def test_fused_gva_matches_xla(pe):
    rng = np.random.RandomState(0)
    feat, coord, idx, rmask, mask = _mk(rng)
    gva = m.GroupedVectorAttention(32, 4, pe_multiplier=pe[0],
                                   pe_bias=pe[1])
    old = m.FUSED_GVA
    try:
        m.FUSED_GVA = "off"
        v = jit_init(gva, jax.random.PRNGKey(0), feat, coord, idx, rmask,
                     mask, train=False)
        ref = np.asarray(jit_apply(gva, v, feat, coord, idx, rmask, mask,
                                   train=False))
        m.FUSED_GVA = "interpret"
        got = np.asarray(jit_apply(gva, v, feat, coord, idx, rmask, mask,
                                   train=False))
    finally:
        m.FUSED_GVA = old
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-2
    mm = np.asarray(mask)
    assert np.corrcoef(got[mm].ravel(), ref[mm].ravel())[0, 1] > 0.999


def test_fused_gva_invalid_rows_zero():
    rng = np.random.RandomState(1)
    feat, coord, idx, rmask, mask = _mk(rng)
    gva = m.GroupedVectorAttention(32, 4)
    old = m.FUSED_GVA
    try:
        m.FUSED_GVA = "interpret"
        v = jit_init(gva, jax.random.PRNGKey(0), feat, coord, idx, rmask,
                     mask, train=False)
        out = np.asarray(jit_apply(gva, v, feat, coord, idx, rmask, mask,
                                   train=False))
    finally:
        m.FUSED_GVA = old
    assert np.abs(out[~np.asarray(mask)]).max() == 0.0
    assert np.isfinite(out).all()
