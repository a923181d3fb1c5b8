"""Tune knn_serial's recall/latency at the >131k dispatch regime.

Scans (window, tile, refine_steps, rescue_frac) on the bench's own
worst case — 163,840 uniform points, self-kNN k=16 — and prints recall
against exact brute-force plus per-call latency.  Used to pick the
defaults that lift `knn_serial_160k_recall` from 0.9172 (BENCH_r04) to
>= 0.99 (VERDICT r4 item 6).

Run on the real TPU: python tools/knn_serial_tune.py [n_points]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.ops import geometry
from pointcloudpdf_tpu.ops.geometry import knn_serial, _knn_chunked

K = 16


def main(n_big=163840):
    rng = np.random.RandomState(7)
    big = jnp.asarray(rng.rand(n_big, 3).astype(np.float32) * 5.0)
    bmask = jnp.ones((n_big,), bool)
    sub = rng.choice(n_big, 2048, replace=False)

    exact = jax.jit(
        lambda q, r: _knn_chunked(q, r, K, jnp.ones((r.shape[0],), bool),
                                  chunk_size=4096, query_tile=2048)[0]
    )
    exact_sub = np.asarray(jax.device_get(exact(big[sub], big)))

    def recall_of(idx_h):
        return float(np.mean([
            len(set(idx_h[sub[i]]) & set(exact_sub[i])) / K
            for i in range(len(sub))
        ]))

    grids = [
        dict(),  # current defaults
        dict(refine_steps=2),
        dict(refine_steps=3),
        dict(refine_steps=2, rescue_frac=0.25),
        dict(window=256, refine_steps=2),
        dict(tile=1024, refine_steps=2),
        dict(window=256, tile=1024, refine_steps=2),
        dict(window=256, tile=1024, refine_steps=3, rescue_frac=0.25),
    ]
    for kw in grids:
        fn = jax.jit(lambda q, m: knn_serial(q, q, K, m, **kw))
        idx, _ = fn(big, bmask)
        idx_h = np.asarray(jax.device_get(idx))
        t0 = time.perf_counter()
        for _ in range(3):
            idx, d = fn(big, bmask)
        jax.block_until_ready(d)
        ms = (time.perf_counter() - t0) / 3 * 1e3
        print(f"{kw or 'defaults'}: recall={recall_of(idx_h):.4f} "
              f"t={ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 163840)
