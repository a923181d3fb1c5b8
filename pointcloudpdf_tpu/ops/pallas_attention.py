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
  ``S = [x_k | x_v | coord_hi | coord_lo | valid-flag]`` (+1 sentinel
  row whose flag is 0 — masked neighbor slots redirect to it, so the
  validity mask rides the gather instead of a separate (M, K) operand).
  Inference payloads are **bfloat16** — the dominant HBM stream halves;
  coords ride as a bf16 hi/lo split that recombines to ~16 mantissa
  bits in f32, so relative positions never feel the quantization, and
  the single-gather structure is preserved (TPU gather cost scales
  with row count — a separate coord gather measured SLOWER than the
  f32 single-gather baseline despite fewer bytes);
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
    [k_g | v_g | coord_hi(3) | coord_lo(3) | flag(1) | pad] — f32 or
    bf16; bf16 payloads carry coords as a hi/lo split (hi = bf16-rounded
    coord, lo = residual), whose f32 recombination keeps ~16 mantissa
    bits so relative positions never feel the bf16 quantization.
    q_ref: (TQ, C) queries; qc_ref: (TQ, 8) query coords (xyz + pad);
    p1_ref: (4, 3) = [W; b] of linear_p1; p2_ref: (4, C) = [W; b] of
    linear_p2; w1_ref: (C+1, G); w2_ref: (G+1, G); aff_ref: (6, C)
    folded BN affines, rows [p_scale(3-lane), p_shift, w1_scale(C),
    w1_shift, w2_scale(G), w2_shift]; out_ref: (TQ, C)."""
    share = c // groups
    tk = tile_q * k

    g = g_ref[:, :].astype(jnp.float32)
    k_g = g[:, :c]                                        # (TK, C)
    v_g = g[:, c:2 * c]                                   # (TK, C)
    p_rel_full = g[:, 2 * c:2 * c + 3] + g[:, 2 * c + 3:2 * c + 6]
    flag = g[:, 2 * c + 6:2 * c + 7]                      # (TK, 1)

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


def _build_payload(x_k, x_v, coord, idx, nmask, dtype=jnp.float32):
    """Combined gathered neighbor payload ``G = S[idx]`` with
    ``S = [x_k | x_v | coord_hi | coord_lo | valid-flag]`` and a zero
    sentinel row per sample (masked slots redirect there, so masked rows
    are all-zero with flag 0).  ONE gather: the TPU gather cost scales
    with row count (scalar-unit dispatch) as much as bytes, so coords
    ride the feature payload instead of a second gather.  For a bf16
    payload the coords are hi/lo split (both bf16-exact), recombining to
    ~16 mantissa bits in the kernel; f32 payloads store (coord, 0).
    Returns ``(payload (B*N*K, Cg_pad) dtype, cg_pad)``."""
    b, n, c = x_k.shape
    cg = 2 * c + 7
    cg_pad = _round_up(cg, _LANE)
    flag = jnp.ones((b, n, 1), jnp.float32)
    coord = coord.astype(jnp.float32)
    if dtype == jnp.float32:
        hi, lo = coord, jnp.zeros_like(coord)
    else:
        hi = coord.astype(dtype).astype(jnp.float32)
        lo = coord - hi
    src = jnp.concatenate(
        [x_k.astype(jnp.float32), x_v.astype(jnp.float32), hi, lo, flag],
        axis=-1)
    src = jnp.pad(src, ((0, 0), (0, 1), (0, cg_pad - cg))).astype(dtype)
    src = src.reshape(b * (n + 1), cg_pad)
    safe_idx = jnp.where(nmask, idx, n)                    # sentinel
    offs = (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None, None]
    flat_idx = (safe_idx + offs).reshape(-1)               # (B*N*K,)
    return jnp.take(src, flat_idx, axis=0), cg_pad


@functools.partial(
    jax.jit,
    static_argnames=("share_planes", "interpret", "tile_q", "payload_dtype"))
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
    payload_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused inference vector attention over batched padded samples.

    x_q/x_k: (B, N, C); x_v: (B, N, C); coord: (B, N, 3); idx: (B, N, K)
    int32 per-sample neighbor rows; nmask: (B, N, K) bool.  Returns
    (B, N, C) == the unfused masked-attention output up to the
    ``payload_dtype`` rounding of k/v (query-invalid rows are whatever
    the softmax guard produces — callers mask them, as the unfused path
    does).
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x_q.shape
    k = idx.shape[-1]
    groups = c // share_planes
    payload, cg_pad = _build_payload(x_k, x_v, coord, idx, nmask,
                                     dtype=payload_dtype)

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

    out = _attention_core(interpret, tq, payload, q2, qc, p1, p2, w1, w2, aff)
    return out[:m].reshape(b, n, c)


# ---------------------------------------------------------------------------
# Training path: custom-VJP'd kernel core + XLA-side masked BN batch stats.
#
# The BN batch statistics (and therefore the train-mode folded affines) are
# computed OUTSIDE the kernel with differentiable jnp reductions over the
# shared gathered payload — so the batch-stat backward coupling (grads
# through mean/var) falls out of autodiff, and only the heavily-fused
# post-affine chain needs a hand-written backward kernel.  The stats pass
# materializes two (B*N*K, C) tensors (p_r and the relation r) — the
# unfused path materializes ~10 — plus 3-channel small fry.
# ---------------------------------------------------------------------------


def _core_fwd_call(payload, q2, qc, p1, p2, w1, w2, aff, *, tq, interpret):
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    m_pad, c = q2.shape
    k = payload.shape[0] // m_pad
    groups = w2.shape[1]
    cg_pad = payload.shape[1]
    grid = (m_pad // tq,)
    return pl.pallas_call(
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention_core(interpret, tq, payload, q2, qc, p1, p2, w1, w2, aff):
    """The pallas region as one differentiable primitive: padded operands
    in, (m_pad, C) attention output out.  Backward is a mirrored Pallas
    kernel that recomputes the chain in VMEM (no saved intermediates)."""
    return _core_fwd_call(payload, q2, qc, p1, p2, w1, w2, aff,
                          tq=tq, interpret=interpret)


def _attention_core_fwd(interpret, tq, payload, q2, qc, p1, p2, w1, w2, aff):
    out = _core_fwd_call(payload, q2, qc, p1, p2, w1, w2, aff,
                         tq=tq, interpret=interpret)
    return out, (payload, q2, qc, p1, p2, w1, w2, aff)


def _attn_bwd_kernel(g_ref, q_ref, qc_ref, p1_ref, p2_ref, w1_ref, w2_ref,
                     aff_ref, dout_ref,
                     dg_ref, dq_ref, dqc_ref, dp1_ref, dp2_ref, dw1_ref,
                     dw2_ref, daff_ref, *, c: int, k: int, groups: int,
                     tile_q: int):
    """Recompute-forward backward: same operand tiles as the forward
    kernel plus the upstream grad; emits the payload/query cotangents and
    per-grid-step parameter-grad partials (summed outside)."""
    share = c // groups
    tk = tile_q * k
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    dotg = functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32)

    # ---- forward recompute (mirrors _attn_kernel) ----------------------
    g = g_ref[:, :].astype(jnp.float32)
    k_g = g[:, :c]
    v_g = g[:, c:2 * c]
    p_rel_full = g[:, 2 * c:2 * c + 3] + g[:, 2 * c + 3:2 * c + 6]
    flag = g[:, 2 * c + 6:2 * c + 7]

    q = q_ref[:, :]
    q_b = jnp.broadcast_to(q[:, None, :], (tile_q, k, c)).reshape(tk, c)
    qc = qc_ref[:, :3]
    qc_b = jnp.broadcast_to(qc[:, None, :], (tile_q, k, 3)).reshape(tk, 3)
    p_rel = p_rel_full - qc_b

    z1 = dot(p_rel, p1_ref[:3, :]) + p1_ref[3:4, :]
    pre1 = z1 * aff_ref[0:1, :3] + aff_ref[1:2, :3]
    h1 = jnp.maximum(pre1, 0.0)
    p_r = dot(h1, p2_ref[:3, :c]) + p2_ref[3:4, :c]

    r = k_g - q_b + p_r
    pre2 = r * aff_ref[2:3, :c] + aff_ref[3:4, :c]
    h2 = jnp.maximum(pre2, 0.0)
    u = dot(h2, w1_ref[:c, :]) + w1_ref[c:c + 1, :]
    pre3 = u * aff_ref[4:5, :groups] + aff_ref[5:6, :groups]
    h3 = jnp.maximum(pre3, 0.0)
    s = dot(h3, w2_ref[:groups, :]) + w2_ref[groups:groups + 1, :]

    valid = flag > 0.5
    s_m = jnp.where(valid, s, jnp.float32(-1e9))
    s3 = s_m.reshape(tile_q, k, groups)
    e = jnp.exp(s3 - jnp.max(s3, axis=1, keepdims=True))
    e = e * flag.reshape(tile_q, k, 1)
    w3 = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-12)
    w = w3.reshape(tk, groups)

    # ---- backward -------------------------------------------------------
    dout = dout_ref[:, :]                                  # (TQ, C)
    dout_b = jnp.broadcast_to(
        dout[:, None, :], (tile_q, k, c)).reshape(tk, c)
    w_full = jnp.concatenate([w] * share, axis=-1)         # (TK, C)
    vp = v_g + p_r

    dv_pe = dout_b * w_full                                # = dv_g and dp_r#1
    dw_full = dout_b * vp
    # share-group reduction dw[., g] = sum_s dw_full[., s*G+g] as a
    # selection matmul — Mosaic cannot shape-cast the lane dim (C -> S, G)
    cmod = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) % groups
    gsel = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    sel = (cmod == gsel).astype(jnp.float32)               # (C, G)
    dw = dot(dw_full, sel)                                 # (TK, G)

    # softmax backward over the K axis
    dw3 = dw.reshape(tile_q, k, groups)
    ds3 = w3 * (dw3 - jnp.sum(w3 * dw3, axis=1, keepdims=True))
    ds = ds3.reshape(tk, groups)

    dh3 = dotg(ds, w2_ref[:groups, :], (((1,), (1,)), ((), ())))
    dw2_p = dotg(h3, ds, (((0,), (0,)), ((), ())))         # (G, G)
    db2w = jnp.sum(ds, axis=0, keepdims=True)              # (1, G)

    dpre3 = jnp.where(pre3 > 0.0, dh3, 0.0)
    du = dpre3 * aff_ref[4:5, :groups]
    da2s = jnp.sum(dpre3 * u, axis=0, keepdims=True)       # (1, G)
    da2t = jnp.sum(dpre3, axis=0, keepdims=True)

    dh2 = dotg(du, w1_ref[:c, :], (((1,), (1,)), ((), ())))
    dw1_p = dotg(h2, du, (((0,), (0,)), ((), ())))         # (C, G)
    db1w = jnp.sum(du, axis=0, keepdims=True)              # (1, G)

    dpre2 = jnp.where(pre2 > 0.0, dh2, 0.0)
    dr = dpre2 * aff_ref[2:3, :c]
    da1s = jnp.sum(dpre2 * r, axis=0, keepdims=True)       # (1, C)
    da1t = jnp.sum(dpre2, axis=0, keepdims=True)

    dk_g = dr
    dq_tile = -jnp.sum(dr.reshape(tile_q, k, c), axis=1)   # (TQ, C)
    dp_r = dv_pe + dr

    dh1 = dotg(dp_r, p2_ref[:3, :c], (((1,), (1,)), ((), ())))  # (TK, 3)
    dp2_p = dotg(h1, dp_r, (((0,), (0,)), ((), ())))       # (3, C)
    db2 = jnp.sum(dp_r, axis=0, keepdims=True)             # (1, C)

    dpre1 = jnp.where(pre1 > 0.0, dh1, 0.0)
    dz1 = dpre1 * aff_ref[0:1, :3]
    daps = jnp.sum(dpre1 * z1, axis=0, keepdims=True)      # (1, 3)
    dapt = jnp.sum(dpre1, axis=0, keepdims=True)

    dp_rel = dotg(dz1, p1_ref[:3, :], (((1,), (1,)), ((), ())))  # (TK, 3)
    dp1_p = dotg(p_rel, dz1, (((0,), (0,)), ((), ())))     # (3, 3)
    db1 = jnp.sum(dz1, axis=0, keepdims=True)              # (1, 3)
    dqc_tile = -jnp.sum(dp_rel.reshape(tile_q, k, 3), axis=1)   # (TQ, 3)

    # ---- writes ---------------------------------------------------------
    cg_pad = g.shape[1]
    # dp_rel lands on the coord_hi slot (lo is a constant in the build,
    # so the full positional cotangent routes through hi)
    dg_ref[:, :] = jnp.concatenate(
        [dk_g, dv_pe, dp_rel,
         jnp.zeros((tk, cg_pad - 2 * c - 3), jnp.float32)],
        axis=1).astype(dg_ref.dtype)
    dq_ref[:, :] = dq_tile
    dqc_ref[:, :] = jnp.concatenate(
        [dqc_tile, jnp.zeros((tile_q, 5), jnp.float32)], axis=1)
    dp1_ref[0] = jnp.concatenate([dp1_p, db1], axis=0)          # (4, 3)
    dp2_ref[0] = jnp.concatenate([dp2_p, db2], axis=0)          # (4, C)
    dw1_ref[0] = jnp.concatenate([dw1_p, db1w], axis=0)         # (C+1, G)
    dw2_ref[0] = jnp.concatenate([dw2_p, db2w], axis=0)         # (G+1, G)

    def padc(row):                                              # (1, L)->(1, C)
        pad = c - row.shape[1]
        if pad == 0:
            return row
        return jnp.concatenate(
            [row, jnp.zeros((1, pad), jnp.float32)], axis=1)

    daff_ref[0] = jnp.concatenate(
        [padc(daps), padc(dapt), da1s, da1t, padc(da2s), padc(da2t)],
        axis=0)                                                 # (6, C)


def _attention_core_bwd(interpret, tq, res, dout):
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    payload, q2, qc, p1, p2, w1, w2, aff = res
    m_pad, c = q2.shape
    k = payload.shape[0] // m_pad
    groups = w2.shape[1]
    cg_pad = payload.shape[1]
    grid_n = m_pad // tq

    out_shapes = (
        jax.ShapeDtypeStruct((m_pad * k, cg_pad), payload.dtype),  # dg
        jax.ShapeDtypeStruct((m_pad, c), jnp.float32),            # dq
        jax.ShapeDtypeStruct((m_pad, 8), jnp.float32),            # dqc
        jax.ShapeDtypeStruct((grid_n, 4, 3), jnp.float32),        # dp1
        jax.ShapeDtypeStruct((grid_n, 4, c), jnp.float32),        # dp2
        jax.ShapeDtypeStruct((grid_n, c + 1, groups), jnp.float32),
        jax.ShapeDtypeStruct((grid_n, groups + 1, groups), jnp.float32),
        jax.ShapeDtypeStruct((grid_n, 6, c), jnp.float32),        # daff
    )
    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, c=c, k=k, groups=groups,
                          tile_q=tq),
        grid=(grid_n,),
        in_specs=[
            vspec((tq * k, cg_pad), lambda i: (i, 0)),
            vspec((tq, c), lambda i: (i, 0)),
            vspec((tq, 8), lambda i: (i, 0)),
            vspec(), vspec(), vspec(), vspec(), vspec(),
            vspec((tq, c), lambda i: (i, 0)),
        ],
        out_specs=(
            vspec((tq * k, cg_pad), lambda i: (i, 0)),
            vspec((tq, c), lambda i: (i, 0)),
            vspec((tq, 8), lambda i: (i, 0)),
            vspec((1, 4, 3), lambda i: (i, 0, 0)),
            vspec((1, 4, c), lambda i: (i, 0, 0)),
            vspec((1, c + 1, groups), lambda i: (i, 0, 0)),
            vspec((1, groups + 1, groups), lambda i: (i, 0, 0)),
            vspec((1, 6, c), lambda i: (i, 0, 0)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(payload, q2, qc, p1, p2, w1, w2, aff, dout)
    dg, dq, dqc, dp1, dp2, dw1, dw2, daff = outs
    return (dg, dq, dqc, dp1.sum(0), dp2.sum(0), dw1.sum(0), dw2.sum(0),
            daff.sum(0))


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def attention_train_stats(payload, q2, qc, p1, p2, w1, k, c,
                          bn_p_affine, bn_w1_affine, bn_w2_affine):
    """Masked batch statistics of the three BN inputs, computed from the
    shared payload with differentiable jnp ops, folded into the (6, C)
    affine sheet the kernel consumes.

    The three BNs are sequential (each affine feeds the next pre-BN
    activation), mirroring the unfused path exactly
    (models/point_transformer/modules.py weight-MLP chain; reference
    point_transformer_seg.py:30-46).  ``bn_*_affine`` are callbacks
    ``(mean, biased_var, cnt) -> (scale, shift)`` — in practice
    ``MaskedBatchNorm.train_affine``, which also updates running stats.
    """
    m_pad = q2.shape[0]
    groups = w1.shape[1]
    g3 = payload.reshape(m_pad, k, -1).astype(jnp.float32)
    flag = g3[..., 2 * c + 6:2 * c + 7]                    # (m, k, 1)
    cnt = jnp.maximum(jnp.sum(flag), 1.0)

    def mstats(x):
        mean = jnp.sum(flag * x, axis=(0, 1)) / cnt
        var = jnp.sum(flag * jnp.square(x), axis=(0, 1)) / cnt \
            - jnp.square(mean)
        return mean, var

    p_rel = (g3[..., 2 * c:2 * c + 3] + g3[..., 2 * c + 3:2 * c + 6]
             - qc[:, None, :3])
    z1 = jnp.einsum("mki,ij->mkj", p_rel, p1[:3]) + p1[3]
    sp, tp_ = bn_p_affine(*mstats(z1), cnt)

    h1 = jnp.maximum(z1 * sp + tp_, 0.0)
    p_r = jnp.einsum("mki,ij->mkj", h1, p2[:3, :c]) + p2[3, :c]
    r = g3[..., :c] - q2[:, None, :] + p_r
    s1, t1 = bn_w1_affine(*mstats(r), cnt)

    h2 = jnp.maximum(r * s1 + t1, 0.0)
    u = jnp.einsum("mki,ij->mkj", h2, w1[:c]) + w1[c]
    s2, t2 = bn_w2_affine(*mstats(u), cnt)

    aff = jnp.zeros((6, c), jnp.float32)
    aff = aff.at[0, :3].set(sp).at[1, :3].set(tp_)
    aff = aff.at[2, :c].set(s1).at[3, :c].set(t1)
    aff = aff.at[4, :groups].set(s2).at[5, :groups].set(t2)
    return aff


def fused_vector_attention_train(
    x_q, x_k, x_v, coord, idx, nmask,
    p1_w, p1_b, p2_w, p2_b, w1_w, w1_b, w2_w, w2_b,
    bn_p_affine, bn_w1_affine, bn_w2_affine,
    share_planes: int = 8, interpret: bool = False, tile_q: int = 0,
    payload_dtype=jnp.float32,
):
    """Training-mode fused vector attention: exact masked-batch-stat
    BatchNorms (stats in XLA, normalization folded into the kernel's
    affine sheet) + the custom-VJP'd Pallas core, so both the forward
    AND backward of the attention chain stay VMEM-resident.

    The gather (and therefore its scatter-add backward) lives in plain
    XLA outside the custom VJP.  Not jitted here — callers are flax
    modules already under jit, and the BN callbacks touch module state.

    A bf16 ``payload_dtype`` halves the step's dominant byte streams —
    the gathered payload (read by the stats pass, the forward kernel and
    the backward recompute), the VJP residual that holds it, and the
    payload-shaped ``dg`` cotangent — at the usual bf16 training cost:
    k/v features and their gradient accumulation carry ~2^-8 rounding
    (coords stay exact via the hi/lo split; all kernel arithmetic is
    f32 in VMEM).
    """
    b, n, c = x_q.shape
    k = idx.shape[-1]
    payload, cg_pad = _build_payload(x_k, x_v, coord, idx, nmask,
                                     dtype=payload_dtype)
    # backward holds ~3x the forward's live temporaries per tile
    tq = tile_q or _pick_tile(k, cg_pad, budget=1 << 19)
    m = b * n
    m_pad = _round_up(m, tq)
    if m_pad > m:
        payload = jnp.pad(payload, ((0, (m_pad - m) * k), (0, 0)))
    q2 = jnp.pad(x_q.astype(jnp.float32).reshape(m, c),
                 ((0, m_pad - m), (0, 0)))
    qc = jnp.zeros((m_pad, 8), jnp.float32)
    qc = qc.at[:m, :3].set(coord.astype(jnp.float32).reshape(m, 3))

    groups = c // share_planes
    p1 = jnp.zeros((4, 3), jnp.float32).at[:3].set(p1_w).at[3].set(p1_b)
    p2 = jnp.zeros((4, c), jnp.float32).at[:3].set(p2_w).at[3].set(p2_b)
    w1 = jnp.zeros((c + 1, groups), jnp.float32).at[:c].set(
        w1_w).at[c].set(w1_b)
    w2 = jnp.zeros((groups + 1, groups), jnp.float32).at[:groups].set(
        w2_w).at[groups].set(w2_b)

    aff = attention_train_stats(payload, q2, qc, p1, p2, w1, k, c,
                                bn_p_affine, bn_w1_affine, bn_w2_affine)
    out = _attention_core(interpret, tq, payload, q2, qc, p1, p2, w1, w2,
                          aff)
    return out[:m].reshape(b, n, c)
