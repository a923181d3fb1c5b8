"""Pallas TPU kernel: fused Stratified-Transformer window attention
(inference).

The XLA path of ``StratifiedWindowAttention``
(models/stratified_transformer/st.py, re-expressing the reference
pointops2 scatter-attention family —
pointcept/models/stratified_transformer/stratified_transformer_v1m1_origin.py:
185-351) already avoids TPU table *gathers* by contracting one-hot bin
matrices on the MXU, but it materializes them in HBM: per block the
three ``(B, M, K, 2L)`` float32 one-hots (~500 MB each at the ScanNet
stage-1 shape) plus the q/k/v table selections round-trip HBM, which is
~70% of the measured 48.7 ms/block (tools/profile_st.py; the payload
gather is the other ~15 ms and stays outside this kernel).

This kernel keeps the whole post-gather chain in VMEM per query tile:

- the caller gathers ONE combined key payload ``G = S[idx]`` where
  ``S = [x_k | x_v | coord_hi | coord_lo | valid-flag]`` with a sentinel
  row (flag 0) for masked slots — identical contract to
  ops/pallas_attention.py.  Inference payloads are **bfloat16** (the
  dominant HBM stream of the whole backbone — K=48 keys per query
  across 21 blocks — halves; coords ride as a bf16 hi/lo split
  recombining to ~16 mantissa bits in f32, so the quantized cRPE bins
  stay exact, and the single-gather structure is preserved: TPU gather
  cost scales with row count, so a separate coord gather measured
  slower);
- per tile: per-head q.k logits, the quantized relative-position bins,
  the three axis one-hots, the cRPE table selections (exact 0/1 MXU
  matmuls), the masked softmax over K, and the rel_value aggregation —
  one HBM read of G, one (TQ, C) write.

Per-head reductions ride 0/1 selector matmuls (``S_hd[c, h] = [c//hd ==
h]``): with a 0/1 operand the MXU split-pass decomposition is exact, so
numerics match the XLA einsum path to f32 rounding.

Use :func:`fused_st_attention`; ``interpret=True`` runs on CPU for
tests (note interpret mode emulates the MXU by rounding dot inputs AND
outputs to bf16 — comparisons need a ~2^-8 relative tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _st_kernel(g_ref, q_ref, qc_ref, tab_ref, sel_ref, selt_ref, out_ref, *,
               c: int, k: int, h: int, l2: int, tile_q: int, scale: float,
               window_size: float, quant_size: float, rel_q: bool,
               rel_k: bool, rel_v: bool):
    """g_ref: (TQ*K, Cg_pad) payload [k_g | v_g | coord_hi(3) |
    coord_lo(3) | flag | pad] (f32 or bf16 — upcast on read);
    q_ref: (TQ, C); qc_ref: (TQ, 8) query coords (xyz + pad);
    tab_ref: (9*L2_pad, C) stacked cRPE tables, row-major
    [tq_x; tq_y; tq_z; tk_x; ...; tv_z] each padded to L2_pad rows
    (zero rows when the corresponding rel_* flag is off);
    sel_ref: (C, H_pad) 0/1 head selector; selt_ref: (H_pad, C) its
    transpose; out_ref: (TQ, C)."""
    tk = tile_q * k
    l2_pad = _round_up(l2, _LANE)

    g = g_ref[:, :].astype(jnp.float32)
    k_g = g[:, :c]                                        # (TK, C)
    v_g = g[:, c:2 * c]                                   # (TK, C)
    pos = g[:, 2 * c:2 * c + 3] + g[:, 2 * c + 3:2 * c + 6]
    flag = g[:, 2 * c + 6:2 * c + 7]                      # (TK, 1)

    q = q_ref[:, :]                                       # (TQ, C)
    q_b = jnp.broadcast_to(q[:, None, :], (tile_q, k, c)).reshape(tk, c)
    qc = qc_ref[:, :3]
    qc_b = jnp.broadcast_to(qc[:, None, :], (tile_q, k, 3)).reshape(tk, 3)

    sel = sel_ref[:, :]                                   # (C, H_pad)
    # the reference scales q ONCE before both the q.k logits and the
    # rel_query table dot (stratified_transformer_v1m1_origin.py:276-299)
    q_b = q_b * scale
    # per-head q.k logits: head_sum(q_scaled ⊙ k) via the 0/1 selector
    logits = jnp.dot(q_b * k_g, sel,
                     preferred_element_type=jnp.float32)  # (TK, H_pad)

    # quantized relative-position bins per axis (st.py chunk_fn)
    rel = qc_b - pos                                      # (TK, 3)
    bins = jnp.floor((rel + 2.0 * window_size - 1e-4) / quant_size)
    bins = jnp.clip(bins, 0.0, float(l2 - 1)).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tk, l2_pad), 1)

    vsel = jnp.zeros((tk, c), jnp.float32)
    for a in range(3):
        oh = (bins[:, a:a + 1] == iota).astype(jnp.float32)  # (TK, L2p)
        if rel_q:
            t_sel = jnp.dot(oh, tab_ref[a * l2_pad:(a + 1) * l2_pad, :],
                            preferred_element_type=jnp.float32)
            logits = logits + jnp.dot(q_b * t_sel, sel,
                                      preferred_element_type=jnp.float32)
        if rel_k:
            t_sel = jnp.dot(
                oh, tab_ref[(3 + a) * l2_pad:(4 + a) * l2_pad, :],
                preferred_element_type=jnp.float32)
            logits = logits + jnp.dot(k_g * t_sel, sel,
                                      preferred_element_type=jnp.float32)
        if rel_v:
            vsel = vsel + jnp.dot(
                oh, tab_ref[(6 + a) * l2_pad:(7 + a) * l2_pad, :],
                preferred_element_type=jnp.float32)

    # masked softmax over the K axis (utils.masked_softmax semantics)
    valid = flag > 0.5
    lg = jnp.where(valid, logits, jnp.float32(-1e9))      # (TK, H_pad)
    l3 = lg.reshape(tile_q, k, -1)
    p3 = jnp.exp(l3 - jnp.max(l3, axis=1, keepdims=True))
    p3 = p3 * flag.reshape(tile_q, k, 1)
    p3 = p3 / jnp.maximum(jnp.sum(p3, axis=1, keepdims=True), 1e-12)
    attn = p3.reshape(tk, -1)                             # (TK, H_pad)

    # out[t, c] = sum_k attn[(t,k), head(c)] * (v_g + vsel)[(t,k), c]
    attn_rep = jnp.dot(attn, selt_ref[:, :],
                       preferred_element_type=jnp.float32)  # (TK, C)
    contrib = attn_rep * (v_g + vsel)
    out_ref[:, :] = jnp.sum(contrib.reshape(tile_q, k, c), axis=1)


# populated lazily so CPU-only test imports stay cheap
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl


def _pick_tile(k: int, cg_pad: int, budget: int = 768 * 1024) -> int:
    """Query rows per program: keep the payload block under ~0.75 MB —
    this kernel holds ~8-10 payload-sized temporaries live (one-hots,
    table selections, broadcasts), and Mosaic's scoped VMEM is ~16 MB."""
    tq = 128
    while tq > 8 and tq * k * cg_pad * 4 > budget:
        tq //= 2
    return tq  # floor 8: Mosaic needs sublane-divisible (8) q/out blocks


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "window_size", "quant_size", "l2", "rel_q", "rel_k",
    "rel_v", "interpret", "tile_q", "payload_dtype"))
def fused_st_attention(
    q: jnp.ndarray,
    coord_q: jnp.ndarray,
    x_k: jnp.ndarray,
    x_v: jnp.ndarray,
    coord_k: jnp.ndarray,
    key_idx: jnp.ndarray,
    key_mask: jnp.ndarray,
    tq_tab: jnp.ndarray,
    tk_tab: jnp.ndarray,
    tv_tab: jnp.ndarray,
    num_heads: int,
    window_size: float,
    quant_size: float,
    l2: int,
    rel_q: bool = True,
    rel_k: bool = True,
    rel_v: bool = True,
    interpret: bool = False,
    tile_q: int = 0,
    payload_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused ST window attention over batched padded samples.

    q: (B, M, C) queries (M may be a chunk of the full point set);
    coord_q: (B, M, 3); x_k/x_v: (B, N, C) full-resolution keys/values;
    coord_k: (B, N, 3); key_idx: (B, M, K) int32 per-sample key rows
    into the N axis; key_mask: (B, M, K) bool (invalid keys get ~0
    probability); t{q,k,v}_tab: (3, 2L, C) merged-channel cRPE tables
    (pass zeros when the rel_* flag is off).  Returns (B, M, C); rows
    whose keys are ALL invalid come out 0 — callers mask query-invalid
    rows anyway, as the unfused path does.
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    b, mq, c = q.shape
    n = x_k.shape[1]
    k = key_idx.shape[-1]
    h = num_heads
    scale = (c // h) ** -0.5
    cg = 2 * c + 7
    cg_pad = _round_up(cg, _LANE)
    l2_pad = _round_up(l2, _LANE)
    h_pad = _LANE

    flag = jnp.ones((b, n, 1), jnp.float32)
    ckf = coord_k.astype(jnp.float32)
    if payload_dtype == jnp.float32:
        hi, lo = ckf, jnp.zeros_like(ckf)
    else:
        hi = ckf.astype(payload_dtype).astype(jnp.float32)
        lo = ckf - hi
    src = jnp.concatenate(
        [x_k.astype(jnp.float32), x_v.astype(jnp.float32), hi, lo, flag],
        axis=-1)
    src = jnp.pad(src, ((0, 0), (0, 1), (0, cg_pad - cg)))
    src = src.astype(payload_dtype).reshape(b * (n + 1), cg_pad)

    safe_idx = jnp.where(key_mask, key_idx, n)             # sentinel
    offs = (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None, None]
    payload = jnp.take(src, (safe_idx + offs).reshape(-1), axis=0)

    tq = tile_q or _pick_tile(k, cg_pad)
    m = b * mq
    m_pad = _round_up(m, tq)
    if m_pad > m:
        payload = jnp.pad(payload, ((0, (m_pad - m) * k), (0, 0)))

    q2 = jnp.pad(q.astype(jnp.float32).reshape(m, c), ((0, m_pad - m), (0, 0)))
    qc = jnp.zeros((m_pad, 8), jnp.float32)
    qc = qc.at[:m, :3].set(coord_q.astype(jnp.float32).reshape(m, 3))

    # stacked table sheet: 9 blocks of L2_pad rows
    tab = jnp.zeros((9 * l2_pad, c), jnp.float32)
    for i, t in enumerate((tq_tab, tk_tab, tv_tab)):
        t3 = t.astype(jnp.float32)                        # (3, 2L, C)
        for a in range(3):
            tab = jax.lax.dynamic_update_slice(
                tab, t3[a], ((3 * i + a) * l2_pad, 0))

    hd = c // h
    ch = jnp.arange(c, dtype=jnp.int32)
    sel = (ch[:, None] // hd
           == jnp.arange(h_pad, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    selt = sel.T

    grid = (m_pad // tq,)
    out = pl.pallas_call(
        functools.partial(
            _st_kernel, c=c, k=k, h=h, l2=l2, tile_q=tq, scale=scale,
            window_size=window_size, quant_size=quant_size,
            rel_q=rel_q, rel_k=rel_k, rel_v=rel_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq * k, cg_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(payload, q2, qc, tab, sel, selt)

    return out[:m].reshape(b, mq, c)
