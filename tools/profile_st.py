"""Attribute ST-v1m1 inference time to its hot components on the TPU.

Times the KPConv stem block, the stratified key-set construction (two
kNNs + window-id machinery), and one window-attention block at the
4x32768 fragment shape with the scanned fetch-synced methodology
(BASELINE.md "microbench gotcha").  Round-3 one-hot-cRPE results:
attention 512 -> 135 ms, KPConv 104 -> 80 ms, key sets 162 -> 101 ms.

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
from pointcloudpdf_tpu.ops.geometry import knn, ball_query

B, N, ITERS = 4, 32768, 5
rng = np.random.RandomState(0)
coords = jnp.asarray(rng.rand(ITERS, B, N, 3).astype(np.float32) * 5.0)
mask = jnp.ones((B, N), bool)

def sync(x): return float(np.asarray(jax.device_get(x)).ravel()[0])
def scan_time(name, per_iter, *xs):
    @jax.jit
    def run(*xs):
        def body(acc, x):
            return acc + per_iter(*x), None
        return jax.lax.scan(body, 0.0, xs)[0]
    sync(run(*xs))
    t0 = time.perf_counter(); sync(run(*xs))
    print(f"{name:44s} {(time.perf_counter()-t0-0.027)/ITERS*1e3:8.2f} ms", flush=True)

C = 48
feats = jnp.asarray(rng.rand(ITERS, B, N, C).astype(np.float32))

# 1) KPConv block (stem, stage-1 shape)
kpb = stm.KPConvBlock(C, C, prev_grid_size=0.02, sigma=1.0, residual=True,
                      kp_radius=2.5, max_neighbor=34)
kv = jax.jit(lambda f, c: kpb.init(jax.random.PRNGKey(0), f, c, mask, False))(feats[0], coords[0])
scan_time("KPConvBlock C=48 @4x32768",
          lambda c, f: jnp.sum(kpb.apply(kv, f, c, mask, False)), coords, feats)

# 2) key sets (the kNN machinery) at stage 1: ds = strided subset
st = stm.StratifiedTransformer(
    downsample_scale=4, depths=[3], channels=[C], num_heads=[3],
    window_size=[0.1], up_k=3, grid_sizes=[0.02], quant_sizes=[0.005],
    num_layers=1, num_classes=13)
ds_idx = jnp.broadcast_to(jnp.arange(0, N, 4, dtype=jnp.int32)[None], (B, N // 4))
ds_valid = jnp.ones((B, N // 4), bool)
def keysets(c):
    ki, km = st._key_sets(c, mask, 0.1, False, ds_idx, ds_valid)
    return jnp.sum(ki.astype(jnp.float32)) + jnp.sum(km)
scan_time("_key_sets (2 kNNs + windows) @4x32768", keysets, coords)

# 3) one attention block given key sets
ki0, km0 = jax.jit(lambda c: st._key_sets(c, mask, 0.1, False, ds_idx, ds_valid))(coords[0])
attn = stm.StratifiedWindowAttention(C, 3, 0.1, 0.005)
av = jax.jit(lambda f, c: attn.init(jax.random.PRNGKey(0), f, c, ki0, km0, mask, False))(feats[0], coords[0])
scan_time("StratifiedWindowAttention C=48 @4x32768",
          lambda c, f: jnp.sum(attn.apply(av, f, c, ki0, km0, mask, False)),
          coords, feats)
