"""Pallas TPU kernel: fused PT-v2 grouped vector attention (inference).

The XLA path of ``GroupedVectorAttention``
(models/point_transformer_v2/ptv2.py, re-expressing reference
pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py:48-130)
materializes the positional-encoding MLP chain, the relation tensor, the
weight-encoding chain and the softmax probabilities as ``(B, N, S, C)``
HBM intermediates per block — the same disease the PT-v1 and ST fused
kernels (ops/pallas_attention.py, ops/pallas_st_attention.py) cured for
their families.

This kernel keeps the post-gather chain in VMEM per query tile:

- the caller computes the q/k MLPs and v projection at (B, N, C) in XLA
  (point-level work, no S axis) and gathers ONE combined payload
  ``G = S[idx]`` with ``S = [k | v | coord_hi | coord_lo | valid-flag]``
  + sentinel row — identical contract to the sibling kernels.  Inference
  payloads are **bfloat16** (the dominant HBM stream halves; coords ride
  as a bf16 hi/lo split recombining to ~16 mantissa bits in f32, and the
  single-gather structure is preserved — TPU gather cost scales with row
  count, so a separate coord gather measured slower);
- per tile: relative positions, the pe_bias / pe_multiplier MLPs
  (inference BatchNorms folded to probed affines), the subtraction
  relation, the grouped weight encoding, the masked softmax over S, and
  the group-blocked aggregation (``ch // (C/G) == g`` selector matmul).

Use :func:`fused_grouped_vector_attention`; ``interpret=True`` runs on
CPU for tests (bf16-emulated MXU — relative tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gva_kernel(g_ref, q_ref, qc_ref, pb1_ref, pb2_ref, pm1_ref, pm2_ref,
                we1_ref, we2_ref, aff_ref, selt_ref, out_ref, *, c: int,
                k: int, groups: int, tile_q: int, pe_mul: bool,
                pe_bias: bool):
    """g_ref: (TQ*K, Cg_pad) payload [k_g | v_g | coord_hi(3) |
    coord_lo(3) | flag | pad] (f32 or bf16 — upcast on read);
    q_ref: (TQ, C); qc_ref: (TQ, 8); pb1/pm1: (4, C) = [W(3,C); b];
    pb2/pm2: (C+1, C) = [W; b]; we1: (C+1, G); we2: (G+1, G);
    aff_ref: (6, C) folded BN affines, rows [peb1_s, peb1_t, pem1_s,
    pem1_t, we_s(G), we_t(G)]; selt_ref: (G_pad, C) group selector
    (row g -> channels of group g); out_ref: (TQ, C)."""
    tk = tile_q * k

    g = g_ref[:, :].astype(jnp.float32)
    k_g = g[:, :c]
    v_g = g[:, c:2 * c]
    pos = g[:, 2 * c:2 * c + 3] + g[:, 2 * c + 3:2 * c + 6]
    flag = g[:, 2 * c + 6:2 * c + 7]

    q = q_ref[:, :]
    q_b = jnp.broadcast_to(q[:, None, :], (tile_q, k, c)).reshape(tk, c)
    qc = qc_ref[:, :3]
    qc_b = jnp.broadcast_to(qc[:, None, :], (tile_q, k, 3)).reshape(tk, 3)
    rel_pos = pos - qc_b                                  # (TK, 3)

    rel = k_g - q_b
    v_eff = v_g
    if pe_mul:
        pem = jnp.dot(rel_pos, pm1_ref[:3, :],
                      preferred_element_type=jnp.float32) + pm1_ref[3:4, :]
        pem = jnp.maximum(pem * aff_ref[2:3, :] + aff_ref[3:4, :], 0.0)
        pem = jnp.dot(pem, pm2_ref[:c, :],
                      preferred_element_type=jnp.float32) + pm2_ref[c:c + 1, :]
        rel = rel * pem
    if pe_bias:
        peb = jnp.dot(rel_pos, pb1_ref[:3, :],
                      preferred_element_type=jnp.float32) + pb1_ref[3:4, :]
        peb = jnp.maximum(peb * aff_ref[0:1, :] + aff_ref[1:2, :], 0.0)
        peb = jnp.dot(peb, pb2_ref[:c, :],
                      preferred_element_type=jnp.float32) + pb2_ref[c:c + 1, :]
        rel = rel + peb
        v_eff = v_g + peb

    w = jnp.dot(rel, we1_ref[:c, :],
                preferred_element_type=jnp.float32) + we1_ref[c:c + 1, :]
    w = jnp.maximum(w * aff_ref[4:5, :groups] + aff_ref[5:6, :groups], 0.0)
    w = jnp.dot(w, we2_ref[:groups, :],
                preferred_element_type=jnp.float32)
    w = w + we2_ref[groups:groups + 1, :]                 # (TK, G)

    # masked softmax over the S axis (utils.masked_softmax semantics)
    valid = flag > 0.5
    w = jnp.where(valid, w, jnp.float32(-1e9))
    w3 = w.reshape(tile_q, k, -1)
    w3 = jnp.exp(w3 - jnp.max(w3, axis=1, keepdims=True))
    w3 = w3 * flag.reshape(tile_q, k, 1)
    w3 = w3 / jnp.maximum(jnp.sum(w3, axis=1, keepdims=True), 1e-12)
    attn = w3.reshape(tk, -1)                             # (TK, G_pad)

    # group-blocked aggregation: out[t, ch] = sum_s attn[(t,s),
    # ch // (C/G)] * v_eff[(t,s), ch]
    attn_rep = jnp.dot(attn, selt_ref[:, :],
                       preferred_element_type=jnp.float32)  # (TK, C)
    contrib = attn_rep * v_eff
    out_ref[:, :] = jnp.sum(contrib.reshape(tile_q, k, c), axis=1)


# populated lazily so CPU-only test imports stay cheap
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl


def _pick_tile(k: int, cg_pad: int, budget: int = 768 * 1024) -> int:
    tq = 128
    while tq > 8 and tq * k * cg_pad * 4 > budget:
        tq //= 2
    return tq


@functools.partial(jax.jit, static_argnames=(
    "groups", "pe_mul", "pe_bias", "interpret", "tile_q",
    "payload_dtype"))
def fused_grouped_vector_attention(
    q: jnp.ndarray,
    x_k: jnp.ndarray,
    x_v: jnp.ndarray,
    coord: jnp.ndarray,
    idx: jnp.ndarray,
    nmask: jnp.ndarray,
    pb1_w, pb1_b, pb2_w, pb2_b,
    pm1_w, pm1_b, pm2_w, pm2_b,
    we1_w, we1_b, we2_w, we2_b,
    peb1_s, peb1_t, pem1_s, pem1_t, we_s, we_t,
    groups: int = 6,
    pe_mul: bool = False,
    pe_bias: bool = True,
    interpret: bool = False,
    tile_q: int = 0,
    payload_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused inference GVA over batched padded samples.

    q/x_k/x_v: (B, N, C) post-MLP projections; coord: (B, N, 3); idx:
    (B, N, S) int32 neighbor rows; nmask: (B, N, S) bool.  The p*/we*
    weight/bias pairs are probed Dense parameters; *_s/*_t are folded
    inference-BN affines (pass zeros for disabled pe branches).  Returns
    (B, N, C) == the unfused masked-GVA output (query-invalid rows are
    whatever the softmax guard produces — callers mask them)."""
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = q.shape
    k = idx.shape[-1]
    cg = 2 * c + 7
    cg_pad = _round_up(cg, _LANE)

    flag = jnp.ones((b, n, 1), jnp.float32)
    coordf = coord.astype(jnp.float32)
    if payload_dtype == jnp.float32:
        hi, lo = coordf, jnp.zeros_like(coordf)
    else:
        hi = coordf.astype(payload_dtype).astype(jnp.float32)
        lo = coordf - hi
    src = jnp.concatenate(
        [x_k.astype(jnp.float32), x_v.astype(jnp.float32), hi, lo, flag],
        axis=-1)
    src = jnp.pad(src, ((0, 0), (0, 1), (0, cg_pad - cg)))
    src = src.astype(payload_dtype).reshape(b * (n + 1), cg_pad)

    safe_idx = jnp.where(nmask, idx, n)                   # sentinel
    offs = (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None, None]
    payload = jnp.take(src, (safe_idx + offs).reshape(-1), axis=0)

    tq = tile_q or _pick_tile(k, cg_pad)
    m = b * n
    m_pad = _round_up(m, tq)
    if m_pad > m:
        payload = jnp.pad(payload, ((0, (m_pad - m) * k), (0, 0)))

    q2 = jnp.pad(q.astype(jnp.float32).reshape(m, c), ((0, m_pad - m), (0, 0)))
    qc = jnp.zeros((m_pad, 8), jnp.float32)
    qc = qc.at[:m, :3].set(coord.astype(jnp.float32).reshape(m, 3))

    def wb(w, bias, c_in, c_out):
        out = jnp.zeros((c_in + 1, c_out), jnp.float32)
        out = out.at[:c_in].set(w.astype(jnp.float32))
        return out.at[c_in].set(bias.astype(jnp.float32))

    pb1 = wb(pb1_w, pb1_b, 3, c)
    pb2 = wb(pb2_w, pb2_b, c, c)
    pm1 = wb(pm1_w, pm1_b, 3, c)
    pm2 = wb(pm2_w, pm2_b, c, c)
    we1 = wb(we1_w, we1_b, c, groups)
    we2 = wb(we2_w, we2_b, groups, groups)

    aff = jnp.zeros((6, c), jnp.float32)
    aff = aff.at[0].set(peb1_s).at[1].set(peb1_t)
    aff = aff.at[2].set(pem1_s).at[3].set(pem1_t)
    aff = aff.at[4, :groups].set(we_s).at[5, :groups].set(we_t)

    share = c // groups
    ch = jnp.arange(c, dtype=jnp.int32)
    selt = (jnp.arange(groups, dtype=jnp.int32)[:, None]
            == (ch // share)[None, :]).astype(jnp.float32)  # (G, C)

    grid = (m_pad // tq,)
    out = pl.pallas_call(
        functools.partial(
            _gva_kernel, c=c, k=k, groups=groups, tile_q=tq,
            pe_mul=pe_mul, pe_bias=pe_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq * k, cg_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((tq, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(payload, q2, qc, pb1, pb2, pm1, pm2, we1, we2, aff, selt)

    return out[:m].reshape(b, n, c)
