"""Microbenchmark: fused Pallas vector attention vs the unfused jnp path.

Times one PointTransformerLayer inference forward per PT-v1 Seg50 stage
configuration on the current backend, and checks output agreement on the
real chip. Run on TPU:

    python tools/microbench_attn.py
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcloudpdf_tpu.models.point_transformer import modules as ptmod
from pointcloudpdf_tpu.models.utils.structure import Points

# (N, K, C) per PT-v1 Seg50 stage at the bench workload (B=4, N=32768)
STAGES = [
    (32768, 8, 32),
    (8192, 16, 64),
    (2048, 16, 128),
    (512, 16, 256),
    (128, 16, 512),
]
B = 4


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    for n, k, c in STAGES:
        coord = jax.random.uniform(rng, (B, n, 3), jnp.float32) * 4.0
        feat = jax.random.normal(jax.random.fold_in(rng, 1), (B, n, c))
        mask = jnp.ones((B, n), bool)
        pts = Points(coord, feat, mask)
        layer = ptmod.PointTransformerLayer(c, c, share_planes=8, nsample=k)

        ptmod.FUSED_ATTENTION = "off"
        variables = jax.jit(
            lambda: layer.init(jax.random.PRNGKey(7), pts, True))()
        ref_fn = jax.jit(lambda v, p: layer.apply(v, p, False))
        dt_ref, ref = timeit(ref_fn, variables, pts, iters=args.iters)

        ptmod.FUSED_ATTENTION = "auto"
        fused_fn = jax.jit(lambda v, p: layer.apply(v, p, False))
        dt_fused, out = timeit(fused_fn, variables, pts, iters=args.iters)

        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        print(f"N={n:6d} K={k:2d} C={c:3d}: unfused {dt_ref*1e3:7.2f} ms  "
              f"fused {dt_fused*1e3:7.2f} ms  ({dt_ref/dt_fused:4.2f}x)  "
              f"max_rel_err {err/scale:.2e}")


if __name__ == "__main__":
    main()
