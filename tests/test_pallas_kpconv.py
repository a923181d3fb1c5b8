"""Sorted-band Pallas KPConv vs the exact ball-query XLA path.

The band path's only approximation is rank-band truncation (a neighbor
more than ``halo`` z-order ranks away is missed) plus the removal of the
XLA path's max_neighbor cap.  On surface-like clouds at the stem's
density both paths see identical neighbor sets, so outputs agree to
matmul rounding; the adversarial case bounds the band-miss error.

Interpret mode emulates the MXU in bf16 — tolerances are relative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.models.stratified_transformer import st as stm
from conftest import jit_apply, jit_init


def _surface_cloud(rng, b=2, n=2048, grid=0.02):
    """Jittered 2D-surface points — ScanNet-stem-like local density."""
    side = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    base = np.stack([xs.ravel(), ys.ravel(),
                     np.zeros(side * side)], -1) * grid
    pts = np.tile(base[None], (b, 1, 1))
    pts = pts + rng.randn(b, side * side, 3) * grid * 0.2
    if side * side < n:
        extra = rng.rand(b, n - side * side, 3) * side * grid
        extra[..., 2] *= 0.01
        pts = np.concatenate([pts, extra], axis=1)
    return jnp.asarray(pts.astype(np.float32))


def _run_block(block, coord, feat, mask, mode):
    old = stm.FUSED_KPCONV
    try:
        stm.FUSED_KPCONV = "off"
        v = jit_init(block, jax.random.PRNGKey(0), feat, coord, mask,
                     train=False)
        stm.FUSED_KPCONV = mode
        out = jit_apply(block, v, feat, coord, mask, train=False)
    finally:
        stm.FUSED_KPCONV = old
    return np.asarray(out)


@pytest.mark.parametrize("residual", [False, True])
def test_band_matches_ball_query(residual):
    rng = np.random.RandomState(0)
    coord = _surface_cloud(rng)
    b, n, _ = coord.shape
    feat = jnp.asarray(rng.rand(b, n, 8).astype(np.float32) - 0.5)
    mask = jnp.asarray(rng.rand(b, n) > 0.05)
    # generous max_neighbor so the XLA path is un-truncated too
    block = stm.KPConvBlock(8, 16, prev_grid_size=0.02, sigma=1.0,
                            residual=residual, kp_radius=2.5,
                            max_neighbor=48)
    ref = _run_block(block, coord, feat, mask, "off")
    got = _run_block(block, coord, feat, mask, "interpret")
    scale = np.abs(ref).max() + 1e-6
    # bf16 interpret rounding everywhere; ~1-2% of in-radius pairs fall
    # outside the z-order band on this (adversarially flat) cloud, so a
    # few percent of rows carry real deviations — bound the bulk and the
    # correlation, not the max (the e2e effect is bounded separately by
    # test_approx_stack-style model-level checks)
    err = np.abs(got - ref) / scale
    assert np.quantile(err, 0.95) < 2.5e-2, float(np.quantile(err, 0.95))
    assert np.median(err) < 5e-3
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_band_neighbor_recall_surface():
    """Direct op-level check: band KPConv ~= uncapped exact KPConv."""
    from pointcloudpdf_tpu.ops.pallas_kpconv import band_kpconv

    rng = np.random.RandomState(1)
    coord = _surface_cloud(rng, b=1, n=4096)
    n = coord.shape[1]
    feat = jnp.asarray(rng.rand(1, n, 4).astype(np.float32))
    mask = jnp.ones((1, n), bool)
    radius = 0.05
    kp = stm.kpconv_kernel_points() * radius
    w = jnp.asarray(rng.rand(kp.shape[0], 4, 8).astype(np.float32) - 0.5)

    got = np.asarray(band_kpconv(coord, feat, mask, w, jnp.asarray(kp),
                                 radius, radius, interpret=True))[0]

    # exact reference: all-pairs influence conv (no caps)
    c = np.asarray(coord[0])
    rel = c[None, :, :] - c[:, None, :]                # (N, N, 3)
    d2 = (rel ** 2).sum(-1)
    ok = d2 <= radius * radius
    dist_p = np.linalg.norm(rel[:, :, None, :] - kp[None, None], axis=-1)
    infl = np.maximum(1.0 - dist_p / radius, 0.0) * ok[..., None]
    per_kp = np.einsum("nwp,wc->npc", infl, np.asarray(feat[0]))
    ref = np.einsum("npc,pcd->nd", per_kp, np.asarray(w))

    scale = np.abs(ref).max() + 1e-6
    err = np.abs(got - ref) / scale
    # band misses affect a few percent of rows; bf16 emulation dominates
    # the bulk
    assert np.quantile(err, 0.95) < 2.5e-2, float(np.quantile(err, 0.95))
    assert np.median(err) < 5e-3
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999
