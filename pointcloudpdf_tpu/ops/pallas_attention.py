"""Pallas TPU kernel: fused PT-v1 vector attention (inference).

The unfused XLA path of ``PointTransformerLayer``
(models/point_transformer/modules.py, re-expressing reference
pointcept/models/point_transformer/point_transformer_seg.py:19-78)
materializes ~10 ``(B, N, K, C)`` intermediates per layer in HBM — the
positional-encoding MLP, the relation tensor, the two weight-MLP stages,
the softmax probabilities and the weighted values.  At the bench workload
(stage-1: N=32768, K=8, C=32) each round trip is >100 MB and the network
is squarely HBM-bound (BASELINE.md attribution: ~78 ms/batch).

This kernel keeps the entire post-projection chain in VMEM:

- the caller gathers ONE combined neighbor payload ``G = S[idx]`` where
  ``S = [x_k | x_v | coord | valid-flag]`` (+1 sentinel row whose flag
  is 0 — masked neighbor slots redirect to it, so the validity mask
  rides the gather instead of a separate (M, K) operand);
- per query tile the kernel runs: relative-position MLP (3->3->C with a
  folded inference BatchNorm affine), the subtraction relation, the
  weight MLP (C->G->G, two folded affines), the masked softmax over the
  K axis, and the share-grouped weighted aggregation — one HBM read of
  G and one (TQ, C) write, nothing else.

BatchNorms fold into (scale, shift) pairs because inference-mode BN is
affine; the flax layer extracts them with zero/one probes so the
parameter tree is identical to the unfused path.  Training keeps the
jnp path (batch statistics are global reductions).

Use :func:`fused_vector_attention`; ``interpret=True`` runs on CPU for
tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(g_ref, q_ref, qc_ref, p1_ref, p2_ref, w1_ref, w2_ref,
                 aff_ref, out_ref, *, c: int, k: int, groups: int,
                 tile_q: int):
    """g_ref: (TQ*K, Cg_pad) combined gathered payload
    [k_g | v_g | coord(3) | flag(1) | pad]; q_ref: (TQ, C) queries;
    qc_ref: (TQ, 8) query coords (xyz + pad); p1_ref: (4, 3) = [W; b] of
    linear_p1; p2_ref: (4, C) = [W; b] of linear_p2; w1_ref: (C+1, G);
    w2_ref: (G+1, G); aff_ref: (6, C) folded BN affines, rows
    [p_scale(3-lane), p_shift, w1_scale(C), w1_shift, w2_scale(G),
    w2_shift]; out_ref: (TQ, C)."""
    share = c // groups
    tk = tile_q * k

    g = g_ref[:, :]
    k_g = g[:, :c]                                        # (TK, C)
    v_g = g[:, c:2 * c]                                   # (TK, C)
    p_rel_full = g[:, 2 * c:2 * c + 3]                    # (TK, 3)
    flag = g[:, 2 * c + 3:2 * c + 4]                      # (TK, 1)

    # broadcast queries over the K minor sublane axis
    q = q_ref[:, :]                                       # (TQ, C)
    q_b = jnp.broadcast_to(q[:, None, :], (tile_q, k, c)).reshape(tk, c)
    qc = qc_ref[:, :3]                                    # (TQ, 3)
    qc_b = jnp.broadcast_to(qc[:, None, :], (tile_q, k, 3)).reshape(tk, 3)
    p_rel = p_rel_full - qc_b                             # (TK, 3)

    # positional MLP: Dense(3) -> BN affine -> relu -> Dense(C)
    p = jnp.dot(p_rel, p1_ref[:3, :], preferred_element_type=jnp.float32)
    p = p + p1_ref[3:4, :]
    p = p * aff_ref[0:1, :3] + aff_ref[1:2, :3]
    p = jnp.maximum(p, 0.0)
    p_r = jnp.dot(p, p2_ref[:3, :c], preferred_element_type=jnp.float32)
    p_r = p_r + p2_ref[3:4, :c]                           # (TK, C)

    # relation + weight MLP: BN -> relu -> Dense(G) -> BN -> relu -> Dense(G)
    r = k_g - q_b + p_r
    r = jnp.maximum(r * aff_ref[2:3, :c] + aff_ref[3:4, :c], 0.0)
    w = jnp.dot(r, w1_ref[:c, :], preferred_element_type=jnp.float32)
    w = w + w1_ref[c:c + 1, :]
    w = jnp.maximum(w * aff_ref[4:5, :groups] + aff_ref[5:6, :groups], 0.0)
    w = jnp.dot(w, w2_ref[:groups, :], preferred_element_type=jnp.float32)
    w = w + w2_ref[groups:groups + 1, :]                  # (TK, G)

    # masked softmax over the K axis (same math as utils.masked_softmax)
    valid = flag > 0.5
    w = jnp.where(valid, w, jnp.float32(-1e9))
    w3 = w.reshape(tile_q, k, groups)
    w3 = jnp.exp(w3 - jnp.max(w3, axis=1, keepdims=True))
    w3 = w3 * flag.reshape(tile_q, k, 1)
    w3 = w3 / jnp.maximum(jnp.sum(w3, axis=1, keepdims=True), 1e-12)
    w = w3.reshape(tk, groups)

    # aggregation: out[t, s*G+g] = sum_k (v+p_r)[tk, s*G+g] * w[tk, g]
    w_full = jnp.concatenate([w] * share, axis=-1)        # (TK, C)
    contrib = (v_g + p_r) * w_full
    out_ref[:, :] = jnp.sum(contrib.reshape(tile_q, k, c), axis=1)


# populated lazily so CPU-only test imports stay cheap
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl


def _pick_tile(k: int, cg_pad: int, budget: int = 1 << 20) -> int:
    """Query rows per program: keep the payload block under ~1 MB VMEM.

    Mosaic's scoped stack holds roughly 6x the payload block across the
    kernel's live temporaries (measured: a 4 MB block OOM'd the 16 MB
    scoped-vmem limit), so ~1 MB keeps headroom for double buffering."""
    tq = 256
    while tq > 8 and tq * k * cg_pad * 4 > budget:
        tq //= 2
    return tq


@functools.partial(
    jax.jit, static_argnames=("share_planes", "interpret", "tile_q"))
def fused_vector_attention(
    x_q: jnp.ndarray,
    x_k: jnp.ndarray,
    x_v: jnp.ndarray,
    coord: jnp.ndarray,
    idx: jnp.ndarray,
    nmask: jnp.ndarray,
    p1_w: jnp.ndarray, p1_b: jnp.ndarray,
    p2_w: jnp.ndarray, p2_b: jnp.ndarray,
    w1_w: jnp.ndarray, w1_b: jnp.ndarray,
    w2_w: jnp.ndarray, w2_b: jnp.ndarray,
    bnp_scale: jnp.ndarray, bnp_shift: jnp.ndarray,
    bnw1_scale: jnp.ndarray, bnw1_shift: jnp.ndarray,
    bnw2_scale: jnp.ndarray, bnw2_shift: jnp.ndarray,
    share_planes: int = 8,
    interpret: bool = False,
    tile_q: int = 0,
) -> jnp.ndarray:
    """Fused inference vector attention over batched padded samples.

    x_q/x_k: (B, N, C); x_v: (B, N, C); coord: (B, N, 3); idx: (B, N, K)
    int32 per-sample neighbor rows; nmask: (B, N, K) bool.  Returns
    (B, N, C) == the unfused masked-attention output (query-invalid rows
    are whatever the softmax guard produces — callers mask them, as the
    unfused path does).
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x_q.shape
    k = idx.shape[-1]
    groups = c // share_planes
    cg = 2 * c + 4
    cg_pad = _round_up(cg, _LANE)

    # combined source with a trailing sentinel row (flag 0) per sample
    flag = jnp.ones((b, n, 1), jnp.float32)
    src = jnp.concatenate(
        [x_k.astype(jnp.float32), x_v.astype(jnp.float32),
         coord.astype(jnp.float32), flag], axis=-1)
    src = jnp.pad(src, ((0, 0), (0, 1), (0, cg_pad - cg)))
    src = src.reshape(b * (n + 1), cg_pad)

    safe_idx = jnp.where(nmask, idx, n)                    # sentinel
    offs = (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None, None]
    flat_idx = (safe_idx + offs).reshape(-1)               # (B*N*K,)
    payload = jnp.take(src, flat_idx, axis=0)              # (B*N*K, Cg)

    tq = tile_q or _pick_tile(k, cg_pad)
    m = b * n
    m_pad = _round_up(m, tq)
    if m_pad > m:
        payload = jnp.pad(payload, ((0, (m_pad - m) * k), (0, 0)))

    q2 = x_q.astype(jnp.float32).reshape(m, c)
    q2 = jnp.pad(q2, ((0, m_pad - m), (0, 0)))
    qc = jnp.zeros((m_pad, 8), jnp.float32)
    qc = qc.at[:m, :3].set(coord.astype(jnp.float32).reshape(m, 3))

    # parameter payloads: [W; b] stacks and a folded-affine sheet
    p1 = jnp.zeros((4, 3), jnp.float32).at[:3].set(p1_w).at[3].set(p1_b)
    p2 = jnp.zeros((4, c), jnp.float32).at[:3].set(p2_w).at[3].set(p2_b)
    w1 = jnp.zeros((c + 1, groups), jnp.float32).at[:c].set(w1_w).at[c].set(w1_b)
    w2 = jnp.zeros((groups + 1, groups), jnp.float32).at[:groups].set(
        w2_w).at[groups].set(w2_b)
    aff = jnp.zeros((6, c), jnp.float32)
    aff = aff.at[0, :3].set(bnp_scale).at[1, :3].set(bnp_shift)
    aff = aff.at[2, :c].set(bnw1_scale).at[3, :c].set(bnw1_shift)
    aff = aff.at[4, :groups].set(bnw2_scale).at[5, :groups].set(bnw2_shift)

    grid = (m_pad // tq,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, c=c, k=k, groups=groups, tile_q=tq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq * k, cg_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        interpret=interpret,
    )(payload, q2, qc, p1, p2, w1, w2, aff)

    return out[:m].reshape(b, n, c)
