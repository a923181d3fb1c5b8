"""Primitive-level TPU microbenchmarks for the geometry fast paths.

Times the building blocks the kNN/FPS designs choose between — row
gathers at several lane widths, sort/argsort, searchsorted,
approx_min_k vs top_k, dynamic-slice windows + MXU distance blocks.

Each primitive runs ITERS times inside ONE jitted lax.scan over fresh
per-iteration inputs: the tunneled TPU has a ~28 ms per-dispatch
round-trip floor that would otherwise swamp sub-30 ms ops.

Usage: python tools/microbench_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 16


def timed(label, per_iter, *arrs, iters=None):
    """arrs have a leading iteration axis; per_iter maps a slice -> scalar."""
    import jax
    import jax.numpy as jnp

    iters = iters or ITERS

    @jax.jit
    def run(*arrs):
        def body(acc, inp):
            return acc + per_iter(*inp), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), arrs)
        return total

    float(np.asarray(jax.device_get(run(*arrs))).ravel()[0])
    t0 = time.perf_counter()
    float(np.asarray(jax.device_get(run(*arrs))).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), f" ITERS={ITERS}")
    rng = np.random.RandomState(0)
    N = 32768

    keys_it = jnp.asarray(
        rng.randint(0, 2**31, (ITERS, N)).astype(np.uint32))
    skeys_it = jnp.sort(keys_it, axis=1)
    q884_it = jnp.asarray(
        rng.randint(0, 2**31, (ITERS, 884736 // 4)).astype(np.uint32))
    ref3_it = jnp.asarray(rng.rand(ITERS, N, 3).astype(np.float32))
    ref32_it = jnp.asarray(rng.rand(ITERS, N, 32).astype(np.float32))
    idx2m_it = jnp.asarray(
        rng.randint(0, N, (ITERS, 2_000_000)).astype(np.int32))

    timed("argsort 32k uint32", lambda k: jnp.argsort(k)[0].astype(
        jnp.float32), keys_it)
    timed("searchsorted 221k over 32k",
          lambda t, q: jnp.searchsorted(t, q)[0].astype(jnp.float32),
          skeys_it, q884_it)
    timed("gather 2M rows of (N,3)", lambda r, i: r[i].sum(),
          ref3_it, idx2m_it)
    timed("gather 2M rows of (N,32)", lambda r, i: r[i].sum(),
          ref32_it, idx2m_it)
    idx05m_it = idx2m_it[:, :500_000]
    timed("gather 0.5M rows of (N,32)", lambda r, i: r[i].sum(),
          ref32_it, idx05m_it)

    d2w_it = jnp.asarray(rng.rand(4, 1024, 32768).astype(np.float32))
    timed("approx_min_k (1024,32768) k16",
          lambda d: jax.lax.approx_min_k(d, 16)[0].sum(), d2w_it,
          iters=4)
    d2m_it = jnp.asarray(rng.rand(4, 32768, 768).astype(np.float32))
    timed("approx_min_k (32768,768) k16",
          lambda d: jax.lax.approx_min_k(d, 16)[0].sum(), d2m_it, iters=4)
    timed("top_k (32768,768) k16",
          lambda d: jax.lax.top_k(-d, 16)[0].sum(), d2m_it, iters=4)
    timed("top_k (32768,96) k16",
          lambda d: jax.lax.top_k(-d[:, :96], 16)[0].sum(), d2m_it, iters=4)

    # full-cloud pairwise dist + approx_min_k (the brute kNN inner loop)
    def brute(r):
        q = r[:4096]
        d2 = (jnp.sum(q * q, 1)[:, None] + jnp.sum(r * r, 1)[None, :]
              - 2.0 * jnp.dot(q, r.T, precision=jax.lax.Precision.HIGHEST))
        return jax.lax.approx_min_k(d2, 16)[0].sum()

    timed("brute dist+select 4096q x 32768r", brute, ref3_it)

    # serialization-window inner loop at full scale (64 tiles x 512q)
    starts_it = jnp.asarray(
        rng.randint(0, N - 768, (ITERS, 64)).astype(np.int32))

    def window_pass(sref, starts):
        def body(carry, s0):
            win = jax.lax.dynamic_slice(sref, (s0, 0), (768, 3))
            q = jax.lax.dynamic_slice(sref, (s0 + 128, 0), (512, 3))
            d2 = (jnp.sum(q * q, 1)[:, None] + jnp.sum(win * win, 1)[None, :]
                  - 2.0 * q @ win.T)
            vals, sel = jax.lax.approx_min_k(d2, 16)
            return carry + vals.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), starts)
        return total

    timed("64x window pass (512q x 768w + select)", window_pass,
          ref3_it, starts_it)


if __name__ == "__main__":
    main()
