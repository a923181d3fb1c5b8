"""Sorted-window implicit-GEMM SubMConv vs the gather-based realization.

The window conv must reproduce SubMConv(neighbor_table_dense) exactly on
raster-sorted rows, and its coverage accounting (occupancy
autocorrelation vs realized match count) must be exact in both
directions: zero when the window covers every neighbor, positive when a
too-small window drops one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.ops.voxel import (kernel_offsets, neighbor_table_dense,
                                         raster_sort)
from pointcloudpdf_tpu.ops.window_conv import (window_match_counts,
                                               window_submconv)

EXT = (40, 40, 64)


def _surface(rng, n):
    side = EXT[0]
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    dz = rng.randint(-1, 2, (side, side))
    z = np.clip(np.cumsum(np.cumsum(dz, axis=0), axis=1) // 4, 0, EXT[2] - 1)
    g = np.stack([xs, ys, z], axis=-1).reshape(-1, 3)
    return g[rng.permutation(side * side)[:n]].astype(np.int32)


def _sorted_setup(rng, n=1200, n_buf=1280):
    g = _surface(rng, n)
    grid = jnp.asarray(np.pad(g, ((0, n_buf - n), (0, 0))))
    mask = jnp.arange(n_buf) < n
    perm, _, m = raster_sort(grid, mask, EXT)
    gs = jnp.take(grid, perm, axis=0)
    return gs, m


def _gather_conv_ref(feat, nbr, kernel):
    out = jnp.zeros((feat.shape[0], kernel.shape[-1]), feat.dtype)
    for k in range(kernel.shape[0]):
        idx = nbr[:, k]
        valid = (idx >= 0)[:, None]
        rows = jnp.take(feat, jnp.maximum(idx, 0), axis=0)
        out = out + jnp.where(valid, rows, 0.0) @ kernel[k]
    return out


@pytest.mark.parametrize("ksize", [3, 5])
def test_matches_gather_conv(rng, ksize):
    gs, m = _sorted_setup(np.random.RandomState(0))
    n_buf = gs.shape[0]
    offs = kernel_offsets(ksize)
    feat = jnp.asarray(rng.rand(n_buf, 16).astype(np.float32))
    feat = jnp.where(m[:, None], feat, 0.0)
    kernel = jnp.asarray(
        rng.randn(offs.shape[0], 16, 24).astype(np.float32) * 0.1)

    nbr = neighbor_table_dense(gs, m, offs, EXT)
    ref = _gather_conv_ref(feat, nbr, kernel)
    ref = jnp.where(m[:, None], ref, 0.0)

    out, match_sum = jax.jit(
        lambda f: window_submconv(f, gs, m, offs, kernel,
                                  tile=128, window=512))(feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    missed = window_match_counts(match_sum, gs, m, offs, EXT)
    assert int(missed) == 0


def test_small_window_surfaces_misses(rng):
    gs, m = _sorted_setup(np.random.RandomState(1))
    offs = kernel_offsets(3)
    feat = jnp.asarray(rng.rand(gs.shape[0], 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.1)
    # window barely larger than the tile: adjacent-x-row neighbors (~40
    # ranks away at this occupancy) fall outside for some tiles
    _, match_sum = window_submconv(feat, gs, m, offs, kernel,
                                   tile=128, window=160)
    missed = window_match_counts(match_sum, gs, m, offs, EXT)
    assert int(missed) > 0


def test_grad_flows(rng):
    gs, m = _sorted_setup(np.random.RandomState(2), n=600, n_buf=640)
    offs = kernel_offsets(3)
    feat = jnp.asarray(rng.rand(640, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.1)

    def loss(f, k):
        out, _ = window_submconv(f, gs, m, offs, k, tile=128, window=512)
        return jnp.sum(out ** 2)

    gf, gk = jax.jit(jax.grad(loss, argnums=(0, 1)))(feat, kernel)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gk)).all()
    assert float(jnp.abs(gf).sum()) > 0 and float(jnp.abs(gk).sum()) > 0
