"""Sorted-window implicit-GEMM submanifold convolution (TPU-native).

Replaces the gather-based SubMConv realization (neighbor_table_dense +
row gathers) for raster-sorted voxel sets.  XLA's TPU gather runs on the
scalar unit (~0.4 GB/s measured on this v5e — tools/microbench_voxel.py),
which made rulebook construction + feature gathers the dominant cost of
PT-v3 (reference submanifold conv: spconv SubMConv3d,
point_transformer_v3m1_base.py Embedding/xCPE).  This formulation never
gathers:

- rows are raster ranks (ops/voxel.raster_sort), so a query tile of T
  consecutive rows has its 3^3/5^3 neighbors inside a bounded rank
  window (neighbors live in the same or adjacent x-rows);
- the window features/keys come from STATIC shifted slices (no gather);
- per kernel offset o, the 0/1 match matrix
  ``M_o[q, w] = (key[w] - key[q] == off_lin(o))`` rides the MXU twice:
  ``out[q] += (M_o @ window_feat) @ W_o`` — implicit gather + GEMM;
- correctness of the window bound is verified EXACTLY and cheaply: the
  true number of neighbor pairs per offset is the autocorrelation of the
  occupancy bitmap at lag o (aligned word shifts + popcount — no
  gathers), compared against ``sum(M_o)``.  A shortfall means the window
  missed neighbors; callers surface it via ``sow`` and tests/bench
  assert zero.

Within one window all keys are rank-local, so int32 key differences
cannot alias across the uint32 pack boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .voxel import build_occupancy, pack_grid


def _off_lin(offsets: np.ndarray) -> np.ndarray:
    """pack_grid key delta per offset (x:11 / y:11 / z:10 bit layout)."""
    return (offsets[:, 0].astype(np.int64) * (1 << 21)
            + offsets[:, 1].astype(np.int64) * (1 << 10)
            + offsets[:, 2].astype(np.int64)).astype(np.int32)


def window_match_counts(match_sum: jnp.ndarray, grid: jnp.ndarray,
                        mask: jnp.ndarray, offsets: jnp.ndarray,
                        extent: Tuple[int, int, int]) -> jnp.ndarray:
    """Exact missed-neighbor count for a window conv (scalar, >= 0).

    ``match_sum`` is the total number of (query, window) matches the conv
    found (sum over all offsets).  The true pair count per offset o is
    sum_cells occ(cell) * occ(cell + o): an occupancy autocorrelation
    computed with aligned shifts of the (X, Y, W) bit words — zero
    gathers.  Returns ``true_total - match_sum`` (0 == full coverage).
    """
    x_ext, y_ext, z_ext = extent
    occ = build_occupancy(grid, mask, extent)[..., 1].astype(jnp.uint32)
    off_np = np.asarray(offsets)
    total = jnp.zeros((), jnp.int32)
    w = occ.shape[-1]
    for ki in range(off_np.shape[0]):
        dx, dy, dz = (int(off_np[ki, 0]), int(off_np[ki, 1]),
                      int(off_np[ki, 2]))
        # shift the occupancy by (dx, dy) with zero fill (static slices)
        sh = occ
        if dx:
            sh = jnp.roll(sh, -dx, axis=0)
            if dx > 0:
                sh = jnp.where((jnp.arange(x_ext) >= x_ext - dx)[:, None, None],
                               jnp.uint32(0), sh)
            else:
                sh = jnp.where((jnp.arange(x_ext) < -dx)[:, None, None],
                               jnp.uint32(0), sh)
        if dy:
            sh = jnp.roll(sh, -dy, axis=1)
            if dy > 0:
                sh = jnp.where((jnp.arange(y_ext) >= y_ext - dy)[None, :, None],
                               jnp.uint32(0), sh)
            else:
                sh = jnp.where((jnp.arange(y_ext) < -dy)[None, :, None],
                               jnp.uint32(0), sh)
        # shift z by dz inside the word stream: whole-word roll + bit shift
        if dz:
            # occupied(z + dz) viewed at bit z: word >> dz with carry-in
            # from the adjacent word
            nxt = jnp.concatenate(
                [sh[..., 1:], jnp.zeros_like(sh[..., :1])], axis=-1)
            prv = jnp.concatenate(
                [jnp.zeros_like(sh[..., :1]), sh[..., :-1]], axis=-1)
            if 0 < dz < 32:
                sh = (sh >> dz) | (nxt << (32 - dz))
            elif -32 < dz < 0:
                sh = (sh << (-dz)) | (prv >> (32 + dz))
            else:
                raise ValueError("window conv supports |dz| < 32")
        total = total + jnp.sum(
            jax.lax.population_count(occ & sh).astype(jnp.int32))
    return total - match_sum.astype(jnp.int32)


def window_match_sum(grid: jnp.ndarray, mask: jnp.ndarray,
                     offsets: jnp.ndarray, tile: int = 256,
                     window: int = 1024) -> jnp.ndarray:
    """Realized (query, neighbor) match count of a window conv, without
    features — the cheap side of the coverage check (compare against the
    occupancy autocorrelation via :func:`window_match_counts`)."""
    c1 = jnp.zeros((grid.shape[0], 1), jnp.float32)
    k1 = jnp.zeros((np.asarray(offsets).shape[0], 1, 1), jnp.float32)
    _, ms = window_submconv(c1, grid, mask, offsets, k1,
                            tile=tile, window=window)
    return ms


def window_submconv(feat: jnp.ndarray, grid: jnp.ndarray,
                    mask: jnp.ndarray, offsets: jnp.ndarray,
                    kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                    tile: int = 256, window: int = 1024):
    """Submanifold sparse conv over raster-sorted rows, gather-free.

    feat: (N, C_in) rows in raster order; grid: (N, 3) int32; mask: (N,)
    valid rows; offsets: (K, 3) host numpy kernel offsets; kernel:
    (K, C_in, C_out); bias: (C_out,) or None.  Returns ((N, C_out),
    match_sum) where match_sum counts realized (query, neighbor) pairs —
    feed it to :func:`window_match_counts` to assert window coverage.

    Center offset (0,0,0) matches the query itself, reproducing the
    identity tap of SubMConv3d.
    """
    n, c_in = feat.shape
    off_np = np.asarray(offsets)
    k = off_np.shape[0]
    c_out = kernel.shape[-1]
    t = tile
    w = window
    assert w >= t and (w - t) % 2 == 0
    halo = (w - t) // 2

    keys = jnp.where(mask, pack_grid(grid), jnp.uint32(0xFFFFFFFF))
    keys_i = keys.astype(jnp.int32)

    n_pad = -(-n // t) * t
    n_tiles = n_pad // t
    qk = jnp.pad(keys_i, (0, n_pad - n),
                 constant_values=np.int32(np.uint32(0xFFFFFFFF)))
    qk = qk.reshape(n_tiles, t)

    # window rows per tile via static shifted slices of a padded copy
    # (sentinel-padded so out-of-range rows never match)
    # right pad must cover the furthest static slice start + n_pad
    # (segment s starts at s*t in padded coordinates); sentinel fill
    # keeps phantom rows match-free
    right = n_pad - n + w
    wk_pad = jnp.pad(keys_i, (halo, right),
                     constant_values=np.int32(np.uint32(0xFFFFFFFF)))
    wf_pad = jnp.pad(feat, ((halo, right), (0, 0)))
    segs = [wk_pad[s * t:s * t + n_pad].reshape(n_tiles, t)
            for s in range(w // t)]
    rem = w % t
    if rem:
        segs.append(wk_pad[(w // t) * t:(w // t) * t + n_pad]
                    .reshape(n_tiles, t)[:, :rem])
    wk = jnp.concatenate(segs, axis=1)                    # (n_tiles, W)
    fsegs = [wf_pad[s * t:s * t + n_pad].reshape(n_tiles, t, c_in)
             for s in range(w // t)]
    if rem:
        fsegs.append(wf_pad[(w // t) * t:(w // t) * t + n_pad]
                     .reshape(n_tiles, t, c_in)[:, :rem])
    wf = jnp.concatenate(fsegs, axis=1)                   # (n_tiles, W, C)

    # rank-local key differences: within a window |diff| is tiny, so
    # int32 arithmetic cannot alias across the uint32 pack space
    diff = wk[:, None, :] - qk[:, :, None]                # (n_tiles, T, W)
    q_valid = qk != np.int32(np.uint32(0xFFFFFFFF))
    w_valid = wk != np.int32(np.uint32(0xFFFFFFFF))
    pair_ok = q_valid[:, :, None] & w_valid[:, None, :]

    lins = _off_lin(off_np)
    out = jnp.zeros((n_tiles, t, c_out), feat.dtype)
    match_sum = jnp.zeros((), jnp.int32)
    for ki in range(k):
        m = (diff == np.int32(lins[ki])) & pair_ok        # (n_tiles, T, W)
        match_sum = match_sum + jnp.sum(m, dtype=jnp.int32)
        gathered = jnp.einsum(
            "btw,bwc->btc", m.astype(feat.dtype), wf)     # (n_tiles, T, C)
        out = out + jnp.einsum("btc,cd->btd", gathered, kernel[ki])
    out = out.reshape(n_pad, c_out)[:n]
    if bias is not None:
        out = out + bias
    return jnp.where(mask[:, None], out, 0.0), match_sum
