"""Microbenchmark: Pallas fused kNN vs the XLA approx_min_k dispatch.

VERDICT r2 item 1: ops/pallas_knn.py was shipped unwired; this script
measures both paths on the real chip at the bench workload (batch of 4
independent 32k self-kNN queries, k=16) plus recall vs exact top-k, so
the dispatch decision in ops/geometry.knn is recorded data, not a guess.

Run: python tools/microbench_knn.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def time_fn(fn, *args, iters=5):
    import jax

    out = fn(*args)
    sync(out)
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def sweep():
    """Tile-parameter sweep of the Pallas kernel at the bench workload."""
    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.ops.pallas_knn import knn_pallas

    n, k, B = 32768, 16, 4
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(B, n, 3).astype(np.float32) * 5.0)
    mask = jnp.ones((B, n), bool)
    for tile_q in (128, 256, 512, 1024):
        for chunk in (1024, 2048, 4096):
            try:
                @jax.jit
                def run(p, m, tq=tile_q, ck=chunk):
                    _, d2 = jax.vmap(lambda q, mm: knn_pallas(
                        q, q, k, mm, tile_q=tq, chunk=ck))(p, m)
                    return jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0))

                t = time_fn(run, pts, mask)
                print(f"tile_q={tile_q:5d} chunk={chunk:5d}"
                      f"  {t*1e3:8.2f} ms")
            except Exception as exc:
                print(f"tile_q={tile_q:5d} chunk={chunk:5d}  FAILED "
                      f"{exc!r}"[:160])


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.ops.geometry import _knn_tpu_approx, _pairwise_dist2
    from pointcloudpdf_tpu.ops.pallas_knn import knn_pallas

    if "--sweep" in sys.argv:
        return sweep()
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 32768, 65536, 131072]
    k = 16
    B = 4
    rng = np.random.RandomState(0)

    for n in sizes:
        pts = jnp.asarray(rng.rand(B, n, 3).astype(np.float32) * 5.0)
        mask = jnp.ones((B, n), bool)

        @jax.jit
        def approx_b(p, m):
            idx, d2 = jax.vmap(
                lambda q, mm: _knn_tpu_approx(q, q, k, mm))(p, m)
            return jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)), idx

        @jax.jit
        def pallas_b(p, m):
            idx, d2 = jax.vmap(
                lambda q, mm: knn_pallas(q, q, k, mm))(p, m)
            return jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)), idx

        def run(f, p, m):
            s, _ = f(p, m)
            return s

        t_approx = time_fn(lambda p, m: approx_b(p, m)[0], pts, mask)
        try:
            t_pallas = time_fn(lambda p, m: pallas_b(p, m)[0], pts, mask)
        except Exception as exc:
            print(f"N={n}: pallas FAILED: {exc!r}"[:300])
            t_pallas = None

        # recall vs exact on sample 0 (queries = first 2048 rows)
        q = pts[0][:2048]

        @jax.jit
        def exact(qq, rr):
            d2 = _pairwise_dist2(qq, rr)
            _, idx = jax.lax.top_k(-d2, k)
            return idx

        e = np.asarray(jax.device_get(exact(q, pts[0])))

        def recall_of(idx_fn):
            idx = np.asarray(jax.device_get(idx_fn()))[:2048]
            return np.mean([len(set(idx[i]) & set(e[i])) / k
                            for i in range(idx.shape[0])])

        r_approx = recall_of(lambda: approx_b(pts, mask)[1][0])
        line = (f"N={n:7d} approx={t_approx*1e3:8.2f} ms"
                f" (recall {r_approx:.4f})")
        if t_pallas is not None:
            r_pallas = recall_of(lambda: pallas_b(pts, mask)[1][0])
            line += (f"  pallas={t_pallas*1e3:8.2f} ms"
                     f" (recall {r_pallas:.4f})"
                     f"  speedup={t_approx/t_pallas:5.2f}x")
        print(line)


if __name__ == "__main__":
    main()
