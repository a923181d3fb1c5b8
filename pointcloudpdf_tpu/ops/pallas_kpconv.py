"""Pallas TPU kernel: sorted-band KPConv (inference), two-pass union.

The XLA path of ``KPConvBlock`` (models/stratified_transformer/st.py,
re-expressing the reference KPConv stem —
pointcept/models/stratified_transformer/stratified_transformer_v1m1_origin.py:
581-662) is gather-bound: the (B, N, S, 3+C) neighbor payload gather is
~4.5M scalar-unit row starts at the ScanNet stem shape (~40 of the
~75 ms/block, tools/profile_st.py), plus a ball-query kNN to build the
neighbor lists at all.

This kernel needs NEITHER the gather NOR the ball query.  Points arrive
z-order sorted, so a query tile of T consecutive rows finds its
radius-ball neighbors inside a rank band [tile - halo, tile + T + halo):

- per tile, the band coords/features arrive as ONE contiguous DMA each
  (HBM -> VMEM) — no per-neighbor starts;
- pairwise distances are exact f32 VPU broadcasts (the tiny KPConv radii
  would drown in a split-matmul's |q||r|*2^-16 cancellation error);
- per kernel point, influence weights form in VMEM and the weighted
  feature aggregation rides the MXU: ``y += (infl_p @ band_feat) @ W_p``.

A single space-filling-curve band misses in-radius pairs that straddle
curve-quadrant boundaries (~3-8% of pairs on flat surfaces — measured
round 3).  The kernel therefore runs TWO passes whose unions cover each
other's boundary jumps: pass A sorts by the plain z-order, pass B by a
quarter-top-cell-shifted z-order (shifting displaces the quadrant
boundaries at every level), and pass B counts ONLY pairs outside the
query's pass-A band — an exact dedup via each point's pass-A rank
carried as a payload lane, so union = sum.  Residual misses measured
0.06% of in-radius pairs on the adversarial flat cloud
(tests/test_pallas_kpconv.py bounds the output error).  The uncapped
band is otherwise MORE complete than the reference's max_neighbor=34
truncation.

Use :func:`band_kpconv`; ``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kpconv_kernel(src_t, feat_src, q_ref, kp_ref, w_ref, out_ref, band_t,
                   bf, sem, *, n_kp: int, radius: float, sigma_r: float,
                   tile: int, band: int, stride: int, n_tiles: int,
                   dedup: bool):
    """src_t: (8, B*stride) HBM [x; y; z; flag; rankA; 0...] transposed;
    feat_src: (B*stride, 128) HBM [feat | zero pad]; q_ref: (T, 8) VMEM
    query rows [x, y, z, flag, rankA, pad]; kp_ref: (P, 3) VMEM kernel
    point coords in ABSOLUTE units (operand, not static — importable
    from a reference checkpoint's K_points); w_ref: (P*128, C_out_pad)
    VMEM kernel weights, rows p*128..p*128+Cm (zero rows elsewhere);
    out_ref: (T, C_out_pad); band_t/bf: VMEM scratch; sem: DMA (2,).
    With ``dedup`` the pair is skipped when the neighbor's pass-A rank
    falls inside the query's pass-A band (it was already counted there)."""
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    b = i // n_tiles
    t = i % n_tiles
    start = b * stride + t * tile

    cp0 = pltpu.make_async_copy(
        src_t.at[:, pl.ds(start, band)], band_t, sem.at[0])
    cp1 = pltpu.make_async_copy(
        feat_src.at[pl.ds(start, band), :], bf, sem.at[1])
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

    q = q_ref[:, :]                                       # (T, 8)
    # exact f32 relative coords per axis: (1, W) - (T, 1) broadcasts
    d0 = band_t[0:1, :] - q[:, 0:1]
    d1 = band_t[1:2, :] - q[:, 1:2]
    d2ax = band_t[2:3, :] - q[:, 2:3]
    dist2 = d0 * d0 + d1 * d1 + d2ax * d2ax               # (T, W)
    ok = ((band_t[3:4, :] > 0.5) & (q[:, 3:4] > 0.5)
          & (dist2 <= radius * radius))
    if dedup:
        # pass-A band of the query: [tA*T - halo, tA*T + T + halo)
        halo = (band - tile) // 2
        t_a = jnp.floor(q[:, 4:5] * (1.0 / tile))         # (T, 1) exact
        lo = t_a * tile - halo
        hi = t_a * tile + (tile + halo)
        r_w = band_t[4:5, :]                              # (1, W)
        ok = ok & ~((r_w >= lo) & (r_w < hi))
    okf = ok.astype(jnp.float32)

    inv_sr = 1.0 / sigma_r
    y = jnp.zeros((tile, out_ref.shape[1]), jnp.float32)
    for p in range(n_kp):
        # SMEM scalar reads (a (1,1) VMEM slice cannot broadcast to a
        # full tile in Mosaic: "unsupported vector.broadcast")
        kx = kp_ref[p, 0]
        ky = kp_ref[p, 1]
        kz = kp_ref[p, 2]
        k2 = kx * kx + ky * ky + kz * kz
        u = dist2 - 2.0 * (d0 * kx + d1 * ky + d2ax * kz) + k2
        dist = jnp.sqrt(jnp.maximum(u, 0.0))
        infl = jnp.maximum(1.0 - dist * inv_sr, 0.0) * okf  # (T, W)
        g = jnp.dot(infl, bf[:, :],
                    preferred_element_type=jnp.float32)   # (T, 128)
        y = y + jnp.dot(g, w_ref[p * _LANE:(p + 1) * _LANE, :],
                        preferred_element_type=jnp.float32)
    out_ref[:, :] = y


# populated lazily so CPU-only test imports stay cheap
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl


def _sort_rank(coord, mask, shift_frac: float):
    """Per-sample z-order permutation + rank, with the sort grid offset
    by ``shift_frac`` of the top-level cell (displaces every quadrant
    boundary so two shifted sorts rarely share a locality break)."""
    from .serialization import MORTON_BITS, morton_encode

    def one(c, m):
        cmin = jnp.min(jnp.where(m[:, None], c, jnp.inf), axis=0)
        cmax = jnp.max(jnp.where(m[:, None], c, -jnp.inf), axis=0)
        extent = jnp.maximum(jnp.max(cmax - cmin), 1e-6)
        scale = ((1 << MORTON_BITS) - 1) / extent
        g = (c - cmin) * scale + shift_frac * (1 << (MORTON_BITS - 1))
        g = jnp.clip(g, 0, (1 << MORTON_BITS) - 1).astype(jnp.int32)
        code = jnp.where(m, morton_encode(g), jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(code).astype(jnp.int32)
        rank = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=jnp.int32))
        return perm, rank

    return jax.vmap(one)(coord, mask)


@functools.partial(jax.jit, static_argnames=(
    "radius", "sigma_r", "tile", "halo", "interpret"))
def band_kpconv(
    coord: jnp.ndarray,
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    weights: jnp.ndarray,
    kp: jnp.ndarray,
    radius: float,
    sigma_r: float,
    tile: int = 128,
    halo: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two-pass sorted-band KPConv over batched padded samples.

    coord: (B, N, 3); feat: (B, N, Cm) with Cm <= 124; mask: (B, N);
    weights: (P, Cm, C_out); kp: (P, 3) kernel point coords in ABSOLUTE
    units (an array operand so a reference checkpoint's exact K_points
    disposition imports); radius: ball cutoff; sigma_r: influence extent
    (the reference's point_influence).  Returns (B, N, C_out) = sum over
    in-radius union-band neighbors of
    relu(1 - |rel - kp_p| / sigma_r) * feat @ W_p, in the ORIGINAL row
    order (the sort round-trips happen inside).
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    b, n, cm = feat.shape
    p = kp.shape[0]
    c_out = weights.shape[-1]
    assert cm <= _LANE - 4
    c_out_pad = _round_up(c_out, _LANE)

    n_pad = _round_up(n, tile)
    n_tiles = n_pad // tile
    stride = n_pad + 2 * halo
    band = tile + 2 * halo

    w_pad = jnp.zeros((p * _LANE, c_out_pad), jnp.float32)
    for pi in range(p):
        w_pad = jax.lax.dynamic_update_slice(
            w_pad, weights[pi].astype(jnp.float32), (pi * _LANE, 0))

    perm_a, rank_a = _sort_rank(coord, mask, 0.0)
    perm_b, _ = _sort_rank(coord, mask, 0.25)
    feat32 = feat.astype(jnp.float32)

    def one_pass(perm, dedup):
        coord_s = jnp.take_along_axis(coord.astype(jnp.float32),
                                      perm[..., None], axis=1)
        feat_s = jnp.take_along_axis(feat32, perm[..., None], axis=1)
        mask_s = jnp.take_along_axis(mask, perm, axis=1)
        ra_s = jnp.take_along_axis(rank_a, perm, axis=1)

        # coord sheet [x | y | z | flag | rankA] with halo pads
        ct = jnp.concatenate(
            [coord_s, mask_s[..., None].astype(jnp.float32),
             ra_s[..., None].astype(jnp.float32)], axis=-1)  # (B, N, 5)
        ct = jnp.pad(ct, ((0, 0), (halo, stride - n - halo), (0, 0)))
        src_t = jnp.pad(ct.transpose(2, 0, 1).reshape(5, b * stride),
                        ((0, 3), (0, 0)))                  # (8, B*stride)

        fs = jnp.pad(feat_s, ((0, 0), (halo, stride - n - halo),
                              (0, _LANE - cm)))
        feat_flat = fs.reshape(b * stride, _LANE)

        q = jnp.pad(ct, ((0, 0), (0, 0), (0, 3)))[:, halo:halo + n_pad]
        q_flat = q.reshape(b * n_pad, 8)

        out = pl.pallas_call(
            functools.partial(
                _kpconv_kernel, n_kp=p, radius=radius, sigma_r=sigma_r,
                tile=tile, band=band, stride=stride, n_tiles=n_tiles,
                dedup=dedup),
            grid=(b * n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, c_out_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * n_pad, c_out_pad),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8, band), jnp.float32),
                pltpu.VMEM((band, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(src_t, feat_flat, q_flat, kp.astype(jnp.float32), w_pad)

        out = out.reshape(b, n_pad, c_out_pad)[:, :n, :c_out]
        inv = jnp.zeros_like(perm)
        inv = jax.vmap(lambda iv, pm: iv.at[pm].set(
            jnp.arange(pm.shape[0], dtype=pm.dtype)))(inv, perm)
        return jnp.take_along_axis(out, inv[..., None], axis=1)

    return one_pass(perm_a, dedup=False) + one_pass(perm_b, dedup=True)
