"""Attribute SpUNet-v1m1 forward time to its components on the TPU.

Times the voxel-indexing primitives (neighbor tables, pooling maps) and
the gather-GEMM conv stack in isolation at bench shapes, then the full
model, with scan-amortized timing (the tunneled chip has a ~28 ms
per-dispatch floor).

Usage: python tools/profile_spunet.py [--iters 4]
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


def timed(label, per_iter, *arrs, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(acc, inp):
            return acc + per_iter(*inp), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), a)
        return total

    float(np.asarray(jax.device_get(run(*arrs))).ravel()[0])
    t0 = time.perf_counter()
    float(np.asarray(jax.device_get(run(*arrs))).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def make_grids(rng, iters):
    xy = rng.randint(0, 320, (iters, BATCH, N, 2))
    z = rng.randint(0, 40, (iters, BATCH, N, 1))
    return np.concatenate([xy, z], axis=-1).astype(np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=4)
    args = parser.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.ops.voxel import (
        gather_conv, kernel_offsets, neighbor_table, unique_parents,
        flatten_neighbor_rows)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    grids = jnp.asarray(make_grids(rng, iters))
    mask = jnp.ones((BATCH, N), bool)
    off3 = kernel_offsets(3)
    off5 = kernel_offsets(5)

    timed("neighbor_table 3^3 (B=4, N=32k)",
          lambda g: jax.vmap(lambda gg: neighbor_table(gg, mask[0], off3)
                             )(g).astype(jnp.float32).mean(), grids,
          iters=iters)
    timed("neighbor_table 5^3 (stem)",
          lambda g: jax.vmap(lambda gg: neighbor_table(gg, mask[0], off5)
                             )(g).astype(jnp.float32).mean(), grids,
          iters=iters)
    timed("unique_parents stride2",
          lambda g: jax.vmap(lambda gg: unique_parents(gg, mask[0], 2,
                                                       capacity=N // 2)[2]
                             )(g).astype(jnp.float32).mean(), grids,
          iters=iters)

    feats_it = jnp.asarray(
        rng.rand(iters, BATCH * N, 32).astype(np.float32))
    w3 = jnp.asarray(rng.rand(27, 32, 32).astype(np.float32) * 0.01)

    def conv_iter(g, feat):
        nbr = flatten_neighbor_rows(
            jax.vmap(lambda gg: neighbor_table(gg, mask[0], off3))(g))
        return gather_conv(feat, nbr, w3).sum()

    timed("table + one 3^3 gather_conv C=32", conv_iter, grids, feats_it,
          iters=iters)

    def conv_only_iter(g, feat):
        nbr = flatten_neighbor_rows(
            jax.vmap(lambda gg: neighbor_table(gg, mask[0], off3))(g))
        nbr = jax.lax.stop_gradient(nbr)
        acc = feat
        for _ in range(4):  # 4 convs over the same table (a block pair)
            acc = gather_conv(acc, nbr, w3)
        return acc.sum()

    timed("table + 4x gather_conv C=32", conv_only_iter, grids, feats_it,
          iters=iters)

    # full model
    from pointcloudpdf_tpu.models import build_model

    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=20),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    feats6_it = jnp.asarray(rng.rand(iters, BATCH, N, 6).astype(np.float32))
    batch0 = dict(grid_coord=grids[0], feat=feats6_it[0], mask=mask,
                  coord=grids[0].astype(jnp.float32) * 0.02)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch0)

    with jax.default_matmul_precision("bfloat16"):
        def fwd(g, f):
            out = model.apply(
                variables,
                dict(grid_coord=g, feat=f, mask=mask,
                     coord=g.astype(jnp.float32) * 0.02),
                train=False)
            return jnp.sum(out["seg_logits"])

        timed("full SpUNet forward", fwd, grids, feats6_it, iters=iters)


if __name__ == "__main__":
    main()
