"""Pallas TPU kernel: fused brute-force kNN with VMEM-resident blocks.

The XLA path (ops/geometry._knn_tpu_approx) lowers to matmul +
``approx_min_k``; profiled on this chip the pair does NOT stay fused —
the (M, N) distance matrix round-trips HBM, pinning a 32k self-kNN at
~16 ms/sample (≈ the 4.3 GB write+read roofline).  This kernel never
lets a distance block leave VMEM:

- per query tile (256 rows) the kernel loops ref chunks (2048 cols);
  distances are EXACT f32 broadcasted outer differences on the VPU (a
  K=8 MXU cross term runs the systolic array at 6% utilization, and
  its split-f32 compensation tripled that cost — measured 2-3x slower
  than the VPU form) and the chunk's distance block lives only in VMEM;
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
    per_chunk = chunk // group

    def chunk_body(c, _):
        r_c = ref_ref[:, pl.ds(c * chunk, chunk)]          # (8, C)
        pen_c = r2_ref[0:1, pl.ds(c * chunk, chunk)]       # (1, C) penalty
        # EXACT f32 distances on the VPU: the matmul identity needs a
        # K=8 cross term — 6% MXU utilization — and split-f32 tripled
        # it; three broadcasted outer differences are ~8x cheaper AND
        # exact (self-distances cancel trivially).  Validity rides a
        # 0-or-3e38 penalty row.
        dx = q[:, 0:1] - r_c[0:1, :]
        dy = q[:, 1:2] - r_c[1:2, :]
        dz = q[:, 2:3] - r_c[2:3, :]
        # floor at a tiny NORMAL float: a zero distance would pack the
        # index into denormal bits, which flush-to-zero erases
        d2 = jnp.maximum(dx * dx + dy * dy + dz * dz + pen_c,
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


def _knn_kernel_pruned(order_ref, lb_ref, ref_ref, q_ref, out_ref, buf_ref,
                       tau_ref, *, k: int, n_chunks: int, home: int,
                       idx_bits: int, out_pad: int, chunk: int, group: int,
                       tile_q: int):
    """Bound-pruned variant: refs arrive z-order sorted so chunks are
    spatially compact; per (tile, chunk) bbox distance lower bounds are
    precomputed on the XLA side and chunks are visited in ascending-bound
    order (``order_ref``/``lb_ref``, SMEM rows).  The first ``home``
    chunks establish a per-tile kth-distance upper bound tau; every later
    chunk with bound > tau is skipped (its candidate slot is stamped
    +inf), which prunes the O(M*N) distance work to the query's spatial
    neighborhood without any recall change — the bound test is geometric
    and conservatively margined against the kernel's packed-mantissa
    truncation (distances themselves are exact f32 VPU differences).

    order_ref: (n_tiles, n_chunks) i32 SMEM (whole array — SMEM
    blocks must keep their trailing dims, so the kernel rows are indexed
    by program_id); lb_ref: (n_tiles, n_chunks) f32 SMEM;
    ref_ref: (n_chunks, 8, chunk) f32 [x;y;z;penalty(0|3e38);0..]; q_ref:
    (tile_q, 8); out_ref: (tile_q, out_pad); buf_ref: (tile_q,
    n_chunks * chunk/group) VMEM scratch; tau_ref: (1, 1) f32 SMEM."""
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    per_chunk = chunk // group
    tile = pl.program_id(0)
    q = q_ref[:, :]

    def process(ci, slot):
        blk = ref_ref[ci]                                  # (8, C)
        pen_c = blk[3:4, :]                                # 0 / 3e38
        # EXACT f32 VPU distances (see _knn_kernel): three broadcasted
        # outer differences replace the 6%-utilization K=8 MXU cross
        # term and its 3-pass split-f32 compensation
        dx = q[:, 0:1] - blk[0:1, :]
        dy = q[:, 1:2] - blk[1:2, :]
        dz = q[:, 2:3] - blk[2:3, :]
        d2 = jnp.maximum(dx * dx + dy * dy + dz * dz + pen_c,
                         jnp.float32(1e-35))
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + ci * chunk
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        key = jax.lax.bitcast_convert_type(
            (bits & ~idx_mask) | col, jnp.float32)
        width = chunk
        while width > per_chunk:
            half = width // 2
            key = jnp.minimum(key[:, :half], key[:, half:width])
            width = half
        buf_ref[:, pl.ds(slot * per_chunk, per_chunk)] = key

    for j in range(home):
        process(order_ref[tile, j], j)

    # per-row kth-smallest over the home region -> tile-scalar tau.
    # Packed keys sit within 2^-8 relative of the true distance (the
    # index bits replace low mantissa) and the XLA-side bounds are
    # scaled by 0.98, so a 1.02 margin keeps the prune test strictly
    # conservative.  A pre-fold to 128 lanes keeps
    # the k extraction passes cheap; group minima can only raise the
    # kth value, so tau stays a valid upper bound.
    work = buf_ref[:, :home * per_chunk]
    width = home * per_chunk
    while width > 128:
        half = width // 2
        work = jnp.minimum(work[:, :half], work[:, half:width])
        width = half
    row_kth = jnp.min(work, axis=1, keepdims=True)
    for _ in range(k - 1):
        work = jnp.where(work == row_kth, jnp.float32(jnp.inf), work)
        row_kth = jnp.min(work, axis=1, keepdims=True)
    tau_ref[0, 0] = jnp.max(
        jnp.where(jnp.isfinite(row_kth), row_kth, jnp.float32(3.4e38))
    ) * jnp.float32(1.02)

    def body(j, _):
        ci = order_ref[tile, j]
        visit = lb_ref[tile, j] <= tau_ref[0, 0]

        @pl.when(visit)
        def _():
            process(ci, j)

        @pl.when(jnp.logical_not(visit))
        def _():
            buf_ref[:, pl.ds(j * per_chunk, per_chunk)] = jnp.full(
                (tile_q, per_chunk), jnp.inf, jnp.float32)

        return 0

    jax.lax.fori_loop(home, n_chunks, body, 0)

    buf = buf_ref[:, :]
    outs = []
    for _ in range(k):
        row_min = jnp.min(buf, axis=1, keepdims=True)
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


def _morton_key(coord: jnp.ndarray) -> jnp.ndarray:
    """10-bit/dim z-order key over the cloud's own bbox (uint32)."""
    lo = jnp.min(coord, axis=0, keepdims=True)
    hi = jnp.max(coord, axis=0, keepdims=True)
    q = jnp.clip((coord - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "tile_q", "chunk",
                                    "group", "prune"))
def knn_pallas(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    tile_q: int = _TILE_Q,
    chunk: int = _CHUNK,
    group: int = _GROUP,
    prune: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (idx (M, k) int32, dist2 (M, k) f32) ascending.

    Same contract as ops.geometry.knn: masked refs never surface and
    slots past the valid candidates hold dist2 == +inf.  Distances carry
    the packed-index mantissa truncation (<= 0.4% relative), like the
    XLA approx path.

    ``prune=None`` auto-selects the bound-pruned kernel when the ref set
    spans >= 4 chunks (z-order sort + bbox bounds skip distance blocks
    outside each query tile's neighborhood; identical results up to the
    shared arithmetic approximations).
    """
    m, n = query.shape[0], ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((n,), bool)
    if prune is None:
        # pruning pays for its sort + bound machinery only when the ref
        # set is large (measured self-kNN: 23.1 -> 19.4 ms at 4x32k k=8,
        # 27.1 -> 16.6 ms at 65k, 109.8 -> 58.0 ms at 131k; it loses
        # 0.7-2.5 ms on the small cross/8k shapes where the brute kernel
        # is already cheap)
        prune = n >= 16384 and (query is ref or n > 32768)
    if prune:
        return _knn_pallas_pruned(query, ref, k, ref_mask,
                                  interpret=interpret, tile_q=tile_q,
                                  chunk=chunk, group=group)

    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    center = jnp.mean(ref, axis=0, keepdims=True)
    qc = (query - center).astype(jnp.float32)
    rc = (ref - center).astype(jnp.float32)

    n_pad = (-n) % chunk
    n_full = n + n_pad
    n_chunks = n_full // chunk
    idx_bits = max((n_full - 1).bit_length(), 1)

    ref_pad8 = jnp.zeros((8, n_full), jnp.float32)
    ref_pad8 = ref_pad8.at[:3, :n].set(rc.T)
    # validity penalty row (the kernel computes exact VPU distances, so
    # no ||r||^2 term is needed — just 0 for valid, +3e38 for masked)
    pen = jnp.where(ref_mask, 0.0, jnp.float32(3e38))
    r2_row = jnp.pad(pen, (0, n_pad), constant_values=3e38)[None, :]

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
        # the kernel's resident set (ref block + candidate scratch +
        # double-buffered tiles) sits right at Mosaic's 16 MB default
        # scoped-vmem limit — surrounding-graph layout changes push it
        # ~0.1 MB over (observed inside vmapped eval forwards); the chip
        # has 128 MB of physical VMEM, so grant explicit headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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


def _knn_pallas_pruned(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: jnp.ndarray,
    interpret: bool,
    tile_q: int,
    chunk: int,
    group: int,
    home: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bound-pruned fused kNN (see _knn_kernel_pruned).

    XLA-side prep: z-order sort both sides (one argsort at 32k measures
    ~0.01 ms on this chip), per-chunk/per-tile bboxes, the (tiles,
    chunks) distance lower-bound matrix with a 0.98 conservative scale,
    and the ascending-bound visit order.  Results are mapped back
    through the permutations, so the contract matches knn_pallas.
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    m, n = query.shape[0], ref.shape[0]
    center = jnp.mean(ref, axis=0, keepdims=True)
    qc = (query - center).astype(jnp.float32)
    rc = (ref - center).astype(jnp.float32)

    # z-order sort; masked refs sink to the tail chunks
    ref_key = jnp.where(ref_mask, _morton_key(rc), jnp.uint32(0xFFFFFFFF))
    ref_perm = jnp.argsort(ref_key).astype(jnp.int32)
    same = query is ref
    q_perm = ref_perm if same else jnp.argsort(_morton_key(qc)).astype(
        jnp.int32)
    rc_s = jnp.take(rc, ref_perm, axis=0)
    mask_s = jnp.take(ref_mask, ref_perm, axis=0)
    qc_s = jnp.take(qc, q_perm, axis=0)

    n_pad = (-n) % chunk
    n_full = n + n_pad
    n_chunks = n_full // chunk
    idx_bits = max((n_full - 1).bit_length(), 1)
    per_chunk = chunk // group

    pen = jnp.where(mask_s, 0.0, jnp.float32(3e38))
    rb = jnp.zeros((8, n_full), jnp.float32)
    rb = rb.at[:3, :n].set(rc_s.T)
    rb = rb.at[3, :].set(jnp.pad(pen, (0, n_pad), constant_values=3e38))
    ref_blocks = rb.reshape(8, n_chunks, chunk).transpose(1, 0, 2)

    m_pad = (-m) % tile_q
    m_full = m + m_pad
    n_tiles = m_full // tile_q
    q_pad8 = jnp.zeros((m_full, 8), jnp.float32)
    q_pad8 = q_pad8.at[:m, :3].set(qc_s)

    # bbox lower bounds; invalid/padded lanes excluded via +/-big
    big = jnp.float32(1e30)
    rcv = jnp.where(mask_s[:, None], rc_s, big)
    rcv = jnp.pad(rcv, ((0, n_pad), (0, 0)), constant_values=big)
    c_lo = jnp.min(rcv.reshape(n_chunks, chunk, 3), axis=1)
    rcv = jnp.where(mask_s[:, None], rc_s, -big)
    rcv = jnp.pad(rcv, ((0, n_pad), (0, 0)), constant_values=-big)
    c_hi = jnp.max(rcv.reshape(n_chunks, chunk, 3), axis=1)
    qcv = jnp.pad(qc_s, ((0, m_pad), (0, 0)))
    t_lo = jnp.min(qcv.reshape(n_tiles, tile_q, 3), axis=1)
    t_hi = jnp.max(qcv.reshape(n_tiles, tile_q, 3), axis=1)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(t_lo[:, None, :] - c_hi[None, :, :],
                    c_lo[None, :, :] - t_hi[:, None, :]),
    )                                                     # (T, C, 3)
    lb = jnp.sum(gap * gap, axis=-1) * jnp.float32(0.98)  # (T, C)
    order = jnp.argsort(lb, axis=1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)

    out_pad = max(k, 128)
    h = min(home, n_chunks)

    packed = pl.pallas_call(
        functools.partial(_knn_kernel_pruned, k=k, n_chunks=n_chunks,
                          home=h, idx_bits=idx_bits, out_pad=out_pad,
                          chunk=chunk, group=group, tile_q=tile_q),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_full, out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, n_chunks * per_chunk), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(order, lb_sorted, ref_blocks, q_pad8)

    packed = packed[:m, :k]
    kb = jax.lax.bitcast_convert_type(packed, jnp.int32)
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    finite = packed < jnp.float32(1e37)
    idx_s = jnp.minimum(jnp.where(finite, kb & idx_mask, 0), n - 1)
    idx = jnp.take(ref_perm, idx_s.reshape(-1)).reshape(m, k)
    idx = jnp.where(finite, idx, 0).astype(jnp.int32)
    d2 = jax.lax.bitcast_convert_type(kb & ~idx_mask, jnp.float32)
    d2 = jnp.where(finite, d2, jnp.inf)
    # rows are in sorted-query order; scatter back to caller order
    out_idx = jnp.zeros((m, k), jnp.int32).at[q_perm].set(idx)
    out_d2 = jnp.full((m, k), jnp.inf, jnp.float32).at[q_perm].set(d2)
    return out_idx, out_d2
