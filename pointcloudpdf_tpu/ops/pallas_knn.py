"""Pallas TPU kernel: fused brute-force kNN with VMEM-resident blocks.

The XLA path (ops/geometry._knn_tpu_approx) lowers to matmul +
``approx_min_k``; profiled on this chip the pair does NOT stay fused —
the (M, N) distance matrix round-trips HBM, pinning a 32k self-kNN at
~16 ms/sample (≈ the 4.3 GB write+read roofline).  This kernel never
lets a distance block leave VMEM:

- per query tile (256 rows) the kernel loops ref chunks (2048 cols);
  the cross term rides the MXU (coords padded 3 -> 8 columns) and the
  chunk's distance block lives only in VMEM;
- each (value, ref index) pair packs into ONE f32 — the index replaces
  the low mantissa bits, and IEEE ordering of non-negative floats makes
  min-reductions carry the index for free (same trick as the XLA path);
- a log2 fold-min reduces every chunk to 64 strided-group minima
  (2 VPU ops/element — the same reduction family approx_min_k uses,
  at VMEM speed), accumulated into a (256, n_chunks*256) buffer;
- k rounds of row-min-extract emit the ascending top-k.

Recall characteristics match the XLA approx path (group-minima can
shadow a same-group second neighbor; <=0.5% at k=16, asserted >=0.99
end-to-end by bench.py's ``knn_recall``).

Use :func:`knn_pallas`; interpret=True runs on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_GROUP = 8           # lanes folded into one candidate per chunk group
_TILE_Q = 256        # query rows per program
_CHUNK = 2048        # ref columns per VMEM block


def _knn_kernel(q_ref, ref_ref, r2_ref, out_ref, buf_ref, *, k: int,
                n_chunks: int, idx_bits: int, out_pad: int,
                chunk: int = _CHUNK, group: int = _GROUP):
    """q_ref: (TILE_Q, 8) f32 (xyz + zero pad); ref_ref: (8, N) f32;
    r2_ref: (1, N) f32 (||r||^2 + validity penalty);
    out_ref: (TILE_Q, out_pad) f32 packed (value|index);
    buf_ref: (TILE_Q, n_chunks * chunk/group) f32 VMEM scratch."""
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    q = q_ref[:, :]                                        # (T, 8)
    # split-f32 cross term: Mosaic's default MXU pass truncates to
    # bf16 (8 mantissa bits), which reorders near-tie neighbors and
    # costs ~15pts of recall; Precision.HIGHEST (6 passes) restores
    # it but measures +22 ms/batch.  3 passes (hi*hi + hi*lo + lo*hi)
    # recover all but the |lo|^2 ~ 2^-16 relative term — and dropping
    # the same |lo|^2 term from ||q||^2 (here) and ||r||^2 (in the
    # wrapper) makes the self-distance cancel exactly.
    q_hi = q.astype(jnp.bfloat16).astype(jnp.float32)
    q_lo = q - q_hi
    q2 = jnp.sum(q * q - q_lo * q_lo, axis=1, keepdims=True)  # (T, 1)
    per_chunk = chunk // group

    def chunk_body(c, _):
        r_c = ref_ref[:, pl.ds(c * chunk, chunk)]          # (8, C)
        r2_c = r2_ref[0:1, pl.ds(c * chunk, chunk)]        # (1, C)
        r_hi = r_c.astype(jnp.bfloat16).astype(jnp.float32)
        r_lo = r_c - r_hi
        cross = jnp.dot(q_hi, r_hi, preferred_element_type=jnp.float32)
        cross += jnp.dot(q_hi, r_lo, preferred_element_type=jnp.float32)
        cross += jnp.dot(q_lo, r_hi, preferred_element_type=jnp.float32)
        # floor at a tiny NORMAL float: a zero distance would pack the
        # index into denormal bits, which flush-to-zero erases
        d2 = jnp.maximum(q2 + r2_c - 2.0 * cross,
                         jnp.float32(1e-35))               # (T, C)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + c * chunk
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        key = jax.lax.bitcast_convert_type(
            (bits & ~idx_mask) | col, jnp.float32)
        # strided fold-min: log2(group) halvings leave per-group minima
        width = chunk
        while width > per_chunk:
            half = width // 2
            key = jnp.minimum(key[:, :half], key[:, half:width])
            width = half
        buf_ref[:, pl.ds(c * per_chunk, per_chunk)] = key
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ascending top-k by repeated row-min extraction; packed keys are
    # unique per row (index bits), so the equality mask hits one lane
    buf = buf_ref[:, :]
    outs = []
    for _ in range(k):
        row_min = jnp.min(buf, axis=1, keepdims=True)      # (T, 1)
        outs.append(row_min)
        buf = jnp.where(buf == row_min, jnp.float32(jnp.inf), buf)
    if out_pad > k:
        outs.append(jnp.full((buf.shape[0], out_pad - k), jnp.inf,
                             jnp.float32))
    out_ref[:, :] = jnp.concatenate(outs, axis=1)


# populated lazily so CPU-only test imports stay cheap
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "tile_q", "chunk",
                                    "group"))
def knn_pallas(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    tile_q: int = _TILE_Q,
    chunk: int = _CHUNK,
    group: int = _GROUP,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (idx (M, k) int32, dist2 (M, k) f32) ascending.

    Same contract as ops.geometry.knn: masked refs never surface and
    slots past the valid candidates hold dist2 == +inf.  Distances carry
    the packed-index mantissa truncation (<= 0.4% relative), like the
    XLA approx path.
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    m, n = query.shape[0], ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((n,), bool)

    center = jnp.mean(ref, axis=0, keepdims=True)
    qc = (query - center).astype(jnp.float32)
    rc = (ref - center).astype(jnp.float32)

    n_pad = (-n) % chunk
    n_full = n + n_pad
    n_chunks = n_full // chunk
    idx_bits = max((n_full - 1).bit_length(), 1)

    ref_pad8 = jnp.zeros((8, n_full), jnp.float32)
    ref_pad8 = ref_pad8.at[:3, :n].set(rc.T)
    # drop the |lo|^2 split residual to mirror the kernel's 3-pass
    # cross term (see _knn_kernel): self-distances then cancel exactly
    rc_lo = rc - rc.astype(jnp.bfloat16).astype(jnp.float32)
    r2 = jnp.sum(rc * rc - rc_lo * rc_lo, axis=-1) + jnp.where(
        ref_mask, 0.0, jnp.float32(3e38))
    r2_row = jnp.pad(r2, (0, n_pad), constant_values=3e38)[None, :]

    m_pad = (-m) % tile_q
    q_pad8 = jnp.zeros((m + m_pad, 8), jnp.float32)
    q_pad8 = q_pad8.at[:m, :3].set(qc)
    n_tiles = (m + m_pad) // tile_q

    out_pad = max(k, 128)
    per_chunk = chunk // group

    packed = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_chunks=n_chunks,
                          idx_bits=idx_bits, out_pad=out_pad,
                          chunk=chunk, group=group),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_q, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, n_chunks * per_chunk), jnp.float32)
        ],
        interpret=interpret,
    )(q_pad8, ref_pad8, r2_row)

    packed = packed[:m, :k]
    kb = jax.lax.bitcast_convert_type(packed, jnp.int32)
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    finite = packed < jnp.float32(1e37)
    idx = jnp.where(finite, kb & idx_mask, 0)
    idx = jnp.minimum(idx, n - 1).astype(jnp.int32)
    d2 = jax.lax.bitcast_convert_type(kb & ~idx_mask, jnp.float32)
    d2 = jnp.where(finite, d2, jnp.inf)
    return idx, d2
