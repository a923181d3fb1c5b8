"""Attribute PT-v3 inference time to its hot components on the TPU.

VERDICT r2 item 2: PT-v3 measured 10x slower than PT-v1 on the same
4x32768 workload with no attribution.  This times each suspect in
isolation at the bench shapes with the same scan-over-fresh-data
methodology as bench.py / tools/profile_ptv1.py:

- the 4 serialization argsorts + inverse scatters per stage,
- the per-stage 3^3 neighbor_table hash build + probes,
- the stride-2 ``unique_parents`` grid pooling,
- one stage-5 Block (512ch attention + MLP) at full vs shrunk capacity,
- the full forward at ``level_capacity_factor`` 1.0 vs 0.5.

Usage:  python tools/profile_ptv3.py [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
N = 32768


def surface_clouds(rng, iters, batch, n, step=0.02):
    """Dense height-field sheets: every xy cell of a ~sqrt(n) square
    patch occupied once, z a smooth random walk — adjacent voxels are
    occupied like a GridSample'd indoor scan, so stride-2 pooling
    merges ~4x (the regime the real ScanNet/S3DIS fragments live in).
    """
    side = int(np.ceil(np.sqrt(n)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    grids = np.zeros((iters, batch, n, 3), np.int32)
    for it in range(iters):
        for bi in range(batch):
            dz = rng.randint(-1, 2, (side, side))
            z = np.clip(np.cumsum(np.cumsum(dz, axis=0), axis=1) // 4, 0, 255)
            g = np.stack([xs, ys, z], axis=-1).reshape(-1, 3)
            grids[it, bi] = g[rng.permutation(side * side)[:n]]
    return grids


def timed(fn, *args, iters, label, points=BATCH * N):
    import jax

    out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt * 1e3:9.2f} ms/call  "
          f"{points / dt / 1e6:8.2f} Mpts/s")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--skip-full", action="store_true")
    args = parser.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.models import build_model
    from pointcloudpdf_tpu.models.point_transformer_v3.ptv3 import _sort_orders
    from pointcloudpdf_tpu.ops.voxel import (
        kernel_offsets, neighbor_table, unique_parents)

    print(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    grids_np = surface_clouds(rng, iters, BATCH, N)
    grids = jnp.asarray(grids_np)
    coords = grids.astype(jnp.float32) * 0.02
    feats = jnp.asarray(rng.rand(iters, BATCH, N, 6).astype(np.float32))
    mask = jnp.ones((BATCH, N), bool)

    def scanned(per_iter, *streams):
        @jax.jit
        def run(*streams):
            def body(acc, inp):
                return acc + per_iter(*inp), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), streams)
            return total
        return functools.partial(run, *streams)

    orders = ("z", "z-trans", "hilbert", "hilbert-trans")

    # --- serialization sorts (4 orders, one stage at N) -----------------
    def sort_iter(grid, feat):
        perms, invs = _sort_orders(grid, mask, orders)
        return perms.astype(jnp.float32).mean()

    timed(scanned(sort_iter, grids, feats), iters=iters,
          label="4-order argsort+inverse, one stage @32768")

    # --- neighbor table (27 offsets, one stage at N) --------------------
    off3 = kernel_offsets(3)

    def nbr_iter(grid, feat):
        nbr = jax.vmap(lambda g, m: neighbor_table(g, m, off3))(grid, mask)
        return nbr.astype(jnp.float32).mean()

    timed(scanned(nbr_iter, grids, feats), iters=iters,
          label="3^3 neighbor_table build+probe @32768")

    # --- grid pooling ---------------------------------------------------
    def pool_iter(grid, feat):
        pg, pm, c2p = jax.vmap(lambda g, m: unique_parents(g, m, 2))(
            grid, mask)
        return c2p.astype(jnp.float32).mean()

    timed(scanned(pool_iter, grids, feats), iters=iters,
          label="unique_parents stride2 @32768")

    # --- dense-occupancy rulebook (sorted rows, static extent) ----------
    from pointcloudpdf_tpu.ops.voxel import neighbor_table_dense, raster_sort

    side = int(np.ceil(np.sqrt(N)))
    ext = (side, side, 256)
    sorted_np = grids_np.copy()
    for it in range(iters):
        for bi in range(BATCH):
            g = sorted_np[it, bi]
            keys = (g[:, 0].astype(np.int64) << 21) | (g[:, 1] << 10) | g[:, 2]
            sorted_np[it, bi] = g[np.argsort(keys)]
    grids_sorted = jnp.asarray(sorted_np)

    def nbr_dense_iter(grid, feat):
        nbr = jax.vmap(
            lambda g, m: neighbor_table_dense(g, m, off3, ext))(grid, mask)
        return nbr.astype(jnp.float32).mean()

    timed(scanned(nbr_dense_iter, grids_sorted, feats), iters=iters,
          label="3^3 neighbor_table_dense @32768 (sorted)")

    off5 = kernel_offsets(5)

    def nbr_dense5_iter(grid, feat):
        nbr = jax.vmap(
            lambda g, m: neighbor_table_dense(g, m, off5, ext))(grid, mask)
        return nbr.astype(jnp.float32).mean()

    timed(scanned(nbr_dense5_iter, grids_sorted, feats), iters=iters,
          label="5^3 neighbor_table_dense @32768 (sorted)")

    from pointcloudpdf_tpu.ops.voxel import unique_parents_sorted

    def pool_sorted_iter(grid, feat):
        pg, pm, c2p = jax.vmap(lambda g, m: unique_parents_sorted(g, m, 2))(
            grid, mask)
        return c2p.astype(jnp.float32).mean()

    timed(scanned(pool_sorted_iter, grids_sorted, feats), iters=iters,
          label="unique_parents_sorted stride2 @32768")

    # --- full model, factor 1.0 vs 0.5 vs 0.5+dense ---------------------
    variants = () if args.skip_full else (
        (1.0, None), (0.5, None), (0.5, ext))
    for factor, dense in variants:
        model = build_model(dict(
            type="DefaultSegmentor",
            backbone=dict(type="PT-v3m1", in_channels=6,
                          level_capacity_factor=factor,
                          dense_extent=dense),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        ))
        batch = dict(coord=coords[0], grid_coord=grids[0], feat=feats[0],
                     mask=mask)
        variables = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.PRNGKey(0)}, batch)

        with jax.default_matmul_precision("bfloat16"):
            def model_iter(grid, feat):
                out = model.apply(
                    variables,
                    dict(coord=grid.astype(jnp.float32) * 0.02,
                         grid_coord=grid, feat=feat, mask=mask),
                    train=False)
                return jnp.sum(out["seg_logits"])

            timed(scanned(model_iter, grids, feats), iters=iters,
                  label=f"full PT-v3 forward (cap x{factor}, "
                        f"dense={dense is not None})")


if __name__ == "__main__":
    main()
