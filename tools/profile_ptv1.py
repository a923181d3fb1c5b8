"""Attribute PT-v1 Seg50 inference time to its hot components on the TPU.

Times each suspect in isolation at the bench shapes (B=4, N=32768) with
the same scan-over-fresh-data methodology as bench.py, then the full
forward, so the residual (dense/BN/elementwise chains) is visible.

Usage:  python tools/profile_ptv1.py [--iters 8]
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


def timed(fn, *args, iters, label, points=BATCH * N):
    import jax

    out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])  # value fetch sync
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt * 1e3:9.2f} ms/call  "
          f"{points / dt / 1e6:8.2f} Mpts/s")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.models import build_model
    from pointcloudpdf_tpu.ops.geometry import knn
    from pointcloudpdf_tpu.ops.sampling import blocked_farthest_point_sampling

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.RandomState(0)
    coords = jnp.asarray(
        rng.rand(iters, BATCH, N, 3).astype(np.float32) * 5.0)
    feats = jnp.asarray(rng.rand(iters, BATCH, N, 6).astype(np.float32))
    mask = jnp.ones((BATCH, N), bool)

    def scanned(per_iter):
        """Run per_iter over each (coord, feat) slice inside one program."""
        @jax.jit
        def run(coords, feats):
            def body(acc, inp):
                return acc + per_iter(*inp), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), (coords, feats))
            return total
        return run

    # --- stage-1 kNN (K=16 self-query, the encoder's biggest table) -----
    def knn_iter(coord, feat):
        idx, d2 = jax.vmap(lambda c: knn(c, c, 16))(coord)
        return idx.astype(jnp.float32).mean()

    timed(scanned(knn_iter), coords, feats, iters=iters, label="knn N=32768 k=16 (stage1)")

    # --- blocked FPS 32768 -> 8192 (stage2 TransitionDown) --------------
    def fps_iter(coord, feat):
        idx, valid = jax.vmap(
            lambda c: blocked_farthest_point_sampling(c, N // 4,
                                                      max_group_steps=64)
        )(coord)
        return idx.astype(jnp.float32).mean()

    timed(scanned(fps_iter), coords, feats, iters=iters, label="blocked FPS 32768->8192")

    # --- stage-2..5 kNN + FPS together (remaining geometry) -------------
    def geom_rest_iter(coord, feat):
        acc = jnp.float32(0.0)
        c = coord
        for stride in (4, 4, 4, 4):
            m = c.shape[1] // stride
            idx, valid = jax.vmap(
                lambda cc: blocked_farthest_point_sampling(cc, m,
                                                           max_group_steps=64)
            )(c)
            nc = jnp.take_along_axis(c, idx[..., None], axis=1)
            nidx, _ = jax.vmap(lambda q, r: knn(q, r, 16))(nc, c)
            acc = acc + nidx.astype(jnp.float32).mean()
            c = nc
            # per-stage self kNN too (blocks reuse one table)
            sidx, _ = jax.vmap(lambda cc: knn(cc, cc, 16))(c)
            acc = acc + sidx.astype(jnp.float32).mean()
        return acc

    timed(scanned(geom_rest_iter), coords, feats, iters=iters, label="geometry stages 2-5 (fps+knn)")

    # --- full model ------------------------------------------------------
    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(type="PointTransformer-Seg50", in_channels=6,
                      num_classes=20),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    batch = dict(coord=coords[0], feat=feats[0], mask=mask)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch)

    with jax.default_matmul_precision("bfloat16"):
        def model_iter(coord, feat):
            out = model.apply(variables, dict(coord=coord, feat=feat,
                                              mask=mask), train=False)
            return jnp.sum(out["seg_logits"])

        timed(scanned(model_iter), coords, feats, iters=iters, label="full PT-v1 Seg50 forward (bf16 mm)")

    with jax.default_matmul_precision("bfloat16"):
        def model_bf16_iter(coord, feat):
            out = model.apply(
                variables,
                dict(coord=coord, feat=feat.astype(jnp.bfloat16), mask=mask),
                train=False)
            return jnp.sum(out["seg_logits"].astype(jnp.float32))

        timed(scanned(model_bf16_iter), coords, feats, iters=iters,
              label="full forward, bf16 feats in")


if __name__ == "__main__":
    main()
