"""Attribute ST-v1m1 inference time per stage at the REAL bench shapes.

Times each component at the shape it actually runs in the ScanNet PDF
configuration (bench.py bench_st): stem KPConvs at N=32768, each
encoder layer's key sets + blocks at its true (N, C, H) after the 4x
TransitionDowns, the TransitionDown/Upsample glue, and the cls head —
with the scanned fetch-synced methodology (BASELINE.md "microbench
gotcha").  The sum should approximately rebuild the full-model time.

Round-3 XLA-path numbers (pre Pallas kernels, 232.7k pts/s = 563 ms):
stem KPConv 72.7+78.0, layer key-sets 25/5/0.1/0, STBlocks 146/174/22/3,
TransitionDown 20.5+3.3+0.9+0.4, Upsample 12, payload-gather-only 15.0
(@8192 K=48) / 5.4 (@2048).  After the fused ST attention + band KPConv
kernels the bench sits at 505.7k pts/s = 259 ms (BENCH extras).

NOTE: components here run whatever dispatch st.FUSED_* selects — set
PCPDF_FUSED_ST_ATTENTION/PCPDF_FUSED_KPCONV=off to profile the XLA path.

Usage: python tools/profile_st.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from pointcloudpdf_tpu.models.stratified_transformer import st as stm

B, ITERS = 4, 5
rng = np.random.RandomState(0)

def sync(x): return float(np.asarray(jax.device_get(x)).ravel()[0])
def scan_time(name, per_iter, *xs):
    @jax.jit
    def run(*xs):
        def body(acc, x):
            return acc + per_iter(*x), None
        return jax.lax.scan(body, 0.0, xs)[0]
    sync(run(*xs))
    t0 = time.perf_counter(); sync(run(*xs))
    ms = (time.perf_counter() - t0 - 0.027) / ITERS * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms

def coords_at(n, scale=5.0):
    return jnp.asarray(rng.rand(ITERS, B, n, 3).astype(np.float32) * scale)

def feats_at(n, c):
    return jnp.asarray(rng.rand(ITERS, B, n, c).astype(np.float32))

total = 0.0

# ---- stem: two KPConv blocks at N=32768 ----
N0 = 32768
mask0 = jnp.ones((B, N0), bool)
c0 = coords_at(N0)
for name, inc, res in (("stem0 KPConv 6->48 @32768", 6, False),
                       ("stem1 KPConv 48->48 res @32768", 48, True)):
    kpb = stm.KPConvBlock(inc, 48, prev_grid_size=0.02, sigma=1.0,
                          residual=res, kp_radius=2.5, max_neighbor=34)
    f = feats_at(N0, inc)
    kv = jax.jit(lambda f0, cc: kpb.init(
        jax.random.PRNGKey(0), f0, cc, mask0, False))(f[0], c0[0])
    total += scan_time(name, lambda cc, ff: jnp.sum(
        kpb.apply(kv, ff, cc, mask0, False)), c0, f)

# ---- per-layer: key sets (both parities) + STBlock x depth ----
# bench config: layers 1..4 at N = 8192, 2048, 512, 128
LAYERS = [  # (N, C, H, ws, qs, depth)
    (8192, 96, 6, 0.2, 0.01, 3),
    (2048, 192, 12, 0.4, 0.02, 9),
    (512, 384, 24, 0.8, 0.04, 3),
    (128, 384, 24, 1.6, 0.08, 3),
]
st = stm.StratifiedTransformer(
    downsample_scale=4, depths=[3], channels=[48], num_heads=[3],
    window_size=[0.1], up_k=3, grid_sizes=[0.02], quant_sizes=[0.005],
    num_layers=1, num_classes=20)
for (n, c, h, ws, qs, depth) in LAYERS:
    m = jnp.ones((B, n), bool)
    cs = coords_at(n)
    fs = feats_at(n, c)
    ds_idx = jnp.broadcast_to(
        jnp.arange(0, n, 4, dtype=jnp.int32)[None], (B, n // 4))
    ds_valid = jnp.ones((B, n // 4), bool)

    def keysets(cc, ws=ws):
        sets = st._key_sets_layer(cc, m, ws, 2, ds_idx, ds_valid)
        return sum(jnp.sum(ki.astype(jnp.float32)) + jnp.sum(km)
                   for ki, km in sets)
    total += scan_time(f"key_sets both parities @{n}", keysets, cs)

    ki0, km0 = jax.jit(lambda cc: st._key_sets_layer(
        cc, m, ws, 1, ds_idx, ds_valid)[0])(cs[0])
    blk = stm.STBlock(c, h, ws, qs, True, True, True, 0.0)
    bv = jax.jit(lambda ff, cc: blk.init(
        jax.random.PRNGKey(0), ff, cc, ki0, km0, m, False))(fs[0], cs[0])
    one = scan_time(
        f"STBlock C={c} H={h} @{n}",
        lambda cc, ff: jnp.sum(blk.apply(bv, ff, cc, ki0, km0, m, False)),
        cs, fs)
    total += one * (depth - 1)
    print(f"{'':52s} x{depth} blocks = {one * depth:8.2f} ms")

# ---- TransitionDown / Upsample glue ----
GLUE = [  # (N_in, C_in, C_out)
    (32768, 48, 96), (8192, 96, 192), (2048, 192, 384), (512, 384, 384)]
for n, ci, co in GLUE:
    m = jnp.ones((B, n), bool)
    cs = coords_at(n)
    fs = feats_at(n, ci)
    td = stm.TransitionDown(ci, co, 0.25, 16)
    tv = jax.jit(lambda ff, cc: td.init(
        jax.random.PRNGKey(0), ff, cc, m, False))(fs[0], cs[0])
    total += scan_time(
        f"TransitionDown {ci}->{co} @{n}",
        lambda cc, ff: jnp.sum(td.apply(tv, ff, cc, m, False)[0]), cs, fs)

for n_lo, ci, co in ((128, 384, 384), (512, 384, 192), (2048, 192, 96),
                     (8192, 96, 48)):
    n_hi = n_lo * 4
    m_lo = jnp.ones((B, n_lo), bool); m_hi = jnp.ones((B, n_hi), bool)
    cl, ch_ = coords_at(n_lo), coords_at(n_hi)
    fl, fh = feats_at(n_lo, ci), feats_at(n_hi, co)
    up = stm.Upsample(3, ci, co)
    uv = jax.jit(lambda a, b, c_, d: up.init(
        jax.random.PRNGKey(0), c_, a, m_lo, d, b, m_hi, False))(
        cl[0], ch_[0], fl[0], fh[0])
    total += scan_time(
        f"Upsample {ci}->{co} {n_lo}->{n_hi}",
        lambda a, b, c_, d: jnp.sum(
            up.apply(uv, c_, a, m_lo, d, b, m_hi, False)),
        cl, ch_, fl, fh)

# ---- hypothesis check: the attention's neighbor-payload gather alone ----
for n, c in ((8192, 96), (2048, 192)):
    src = jnp.asarray(rng.rand(ITERS, B, n, 2 * c + 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (ITERS, B, n, 48)).astype(np.int32))
    scan_time(f"gather only (B,{n},48,{2*c+3})",
              lambda s, i: jnp.sum(jax.vmap(lambda f, j: f[j])(s, i)),
              src, idx)

print(f"{'SUM of stages':52s} {total:8.2f} ms")
