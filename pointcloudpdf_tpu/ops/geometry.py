"""Neighborhood geometry ops over fixed-size padded point sets.

TPU-native replacements for the reference's CUDA pointops
(libs/pointops/src/*: knn_query, ball_query, grouping, interpolation).
Design: every op takes a single (possibly padded) point set with a validity
mask and returns *static-shape* neighbor tables; invalid slots are signalled
through an explicit boolean mask rather than the reference's -1 sentinel.
Distances are computed as chunked ``||q||^2 + ||r||^2 - 2 q.r^T`` so the
inner product rides the MXU; running top-k keeps VMEM pressure bounded.

Batched variants (`*_batched`) vmap over a leading batch dimension.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _pairwise_dist2(query: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance matrix (Mq, Nr) via MXU-friendly matmul.

    Coordinates are centered first: the ||q||^2 + ||r||^2 - 2 q.r^T
    identity carries absolute error ~ eps * max||x||^2, which at a 60 m
    outdoor-scan offset (3600 m^2 terms) is ~4e-4 — enough to reorder
    near-tie neighbors.  Centering shrinks the terms to the cloud's
    half-extent.
    """
    center = jnp.mean(ref, axis=0, keepdims=True)
    query = query - center
    ref = ref - center
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)      # (M, 1)
    r2 = jnp.sum(ref * ref, axis=-1, keepdims=True).T        # (1, N)
    # full fp32 MXU passes: coordinate geometry cannot tolerate bf16 rounding
    cross = jnp.dot(
        query,
        ref.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = q2 + r2 - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _merge_topk(best_d, best_i, cand_d, cand_i, k: int):
    """Merge (M,k) running best with (M,C) candidates; keep k smallest."""
    all_d = jnp.concatenate([best_d, cand_d], axis=-1)
    all_i = jnp.concatenate([best_i, cand_i], axis=-1)
    neg_d, arg = jax.lax.top_k(-all_d, k)
    return -neg_d, jnp.take_along_axis(all_i, arg, axis=-1)


# Test/profiling hook: force one dispatch arm regardless of backend and
# size — "auto" (default) keeps the measured dispatch; "exact" = chunked
# brute top-k; "serial" = serialization-window; "approx" = approx_min_k.
# Set at trace time (re-jit after changing); used by the end-to-end
# approximation-bound tests (tests/test_approx_stack.py).
FORCE_KNN_PATH = "auto"


def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk_size: int = 4096,
    query_tile: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query among valid ref points.

    Equivalent of the reference kNN CUDA kernel
    (libs/pointops/src/knn_query/knn_query_cuda_kernel.cu:60-112) minus the
    per-batch offset scan: batching is handled by vmap over padded samples.

    ``query_tile=None`` (default) self-tunes per dispatch path (8192 for
    the TPU approx path, 4096 for the lax fallback); the Pallas and
    serialization paths tile internally and ignore it.

    Returns (idx (M, k) int32, dist2 (M, k) f32) sorted ascending by
    distance. Slots beyond the number of valid refs have dist2 == +inf.
    """
    M = query.shape[0]
    N = ref.shape[0]
    is_self = query is ref  # preserved through conversion for knn_serial
    query = jnp.asarray(query, jnp.float32)
    ref = query if is_self else jnp.asarray(ref, jnp.float32)
    if ref_mask is None:
        ref_mask = jnp.ones((N,), bool)
    else:
        ref_mask = jnp.asarray(ref_mask)

    if k > N:
        # fewer candidates than neighbors: pad with the nearest neighbor
        idx, dist2 = knn(query, ref, N, query_mask, ref_mask,
                         chunk_size=chunk_size, query_tile=query_tile)
        pad_idx = jnp.broadcast_to(idx[:, :1], (M, k - N))
        pad_d = jnp.full((M, k - N), _INF, jnp.float32)
        return (
            jnp.concatenate([idx, pad_idx], axis=1),
            jnp.concatenate([dist2, pad_d], axis=1),
        )

    # TPU dispatch (numbers from tools/microbench_knn.py + the scanned
    # on-chip shape study in BASELINE.md on this v5e):
    # - lax.top_k lowers to a full sort (~3.7 s for a 4x32768 self-kNN);
    # - the fused Pallas kernel (ops/pallas_knn.py) keeps every distance
    #   block in VMEM; its bound-pruned variant (z-sort + bbox chunk
    #   skipping) self-selects on large self-kNN.  Measured per-sample
    #   self-kNN k=16 vs the XLA approx path: 23.0 vs ~31 ms at 32k,
    #   16.6 vs 57.5 ms at 65k, 58.0 vs 224.0 ms at 131k (recall
    #   0.9985-0.9998 vs exact, >= the approx path's).  Below N=8192 the
    #   single-chunk fold sheds same-group neighbors (recall < 0.99)
    #   while the approx path is already fast;
    # - beyond 131072 the candidate scratch outgrows the kernel's VMEM
    #   budget, so the ref set is SPLIT into <=131072-row parts, the
    #   pruned kernel runs per part, and the per-part top-k merge is
    #   exact (the union of part candidates == the full candidate set,
    #   so recall stays at the kernel's ~0.995 — the round-4 handoff to
    #   knn_serial here measured 0.9172 at 160k refs, an 8% silent
    #   neighbor error for outdoor buckets);
    # - past 4 parts (~524k refs) the linear-cost serialization-window
    #   path (knn_serial) takes over (full-scene eval fragments run up
    #   to ~800k points).
    # Geometry consumers mask by validity, so a sub-1% neighbor swap is
    # within the padding noise.
    if FORCE_KNN_PATH == "serial":
        return knn_serial(query, ref, k, ref_mask)
    if FORCE_KNN_PATH == "approx":
        return _knn_tpu_approx(query, ref, k, ref_mask,
                               query_tile=query_tile or 8192)
    if FORCE_KNN_PATH == "exact":
        query_tile = query_tile or 4096
        if N <= chunk_size:
            d2 = _pairwise_dist2(query, ref)
            d2 = jnp.where(ref_mask[None, :], d2, _INF)
            neg_d, idx = jax.lax.top_k(-d2, k)
            return idx.astype(jnp.int32), -neg_d
        return _knn_chunked(query, ref, k, ref_mask, chunk_size, query_tile)
    if jax.default_backend() == "tpu" and N > 131072:
        n_parts = -(-N // 131072)
        if n_parts <= 4 and k <= 64:
            return _knn_pallas_split(query, ref, k, ref_mask, n_parts)
        return knn_serial(query, ref, k, ref_mask)
    if jax.default_backend() == "tpu" and 8192 <= N <= 131072 and k <= 64:
        from .pallas_knn import knn_pallas

        idx, dist2 = knn_pallas(query, ref, k, ref_mask)
        # kNN selection is combinatorial: no gradient flows through the
        # packed-float kernel (the CUDA reference is equally non-diff)
        return idx, jax.lax.stop_gradient(dist2)
    if jax.default_backend() == "tpu" and N > 128:
        return _knn_tpu_approx(query, ref, k, ref_mask,
                               query_tile=query_tile or 8192)

    query_tile = query_tile or 4096

    if N <= chunk_size:
        d2 = _pairwise_dist2(query, ref)
        d2 = jnp.where(ref_mask[None, :], d2, _INF)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d

    return _knn_chunked(query, ref, k, ref_mask, chunk_size, query_tile)


def _knn_pallas_split(query, ref, k, ref_mask, n_parts: int):
    """Exact-merge split dispatch for ref sets past the fused kernel's
    131072-row candidate-scratch budget: the refs split into ``n_parts``
    equal slices, the bound-pruned Pallas kernel (ops/pallas_knn.py)
    runs per slice, and the slice top-ks merge by distance.  The union
    of slice candidate sets is the full ref set, so recall equals the
    kernel's own (~0.995) instead of knn_serial's curve-window recall.
    """
    from .pallas_knn import knn_pallas

    N = ref.shape[0]
    part = -(-N // n_parts)
    pad = part * n_parts - N
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    mask_p = jnp.pad(ref_mask, (0, pad))          # pad rows invalid
    best_d = best_i = None
    for p in range(n_parts):
        idx, d2 = knn_pallas(query, ref_p[p * part:(p + 1) * part], k,
                             mask_p[p * part:(p + 1) * part])
        idx = idx + p * part
        if best_d is None:
            best_d, best_i = d2, idx
        else:
            best_d, best_i = _merge_topk(best_d, best_i, d2, idx, k)
    # slots past the valid candidates carry +inf dist2; clamp their idx
    # into range so downstream gathers stay in bounds
    best_i = jnp.minimum(best_i, N - 1).astype(jnp.int32)
    return best_i, jax.lax.stop_gradient(best_d)


def _knn_chunked(query, ref, k, ref_mask, chunk_size, query_tile):
    """Exact chunked brute force: scan ref chunks per query tile."""
    M, N = query.shape[0], ref.shape[0]
    # pad ref to a multiple of chunk_size
    n_chunks = -(-N // chunk_size)
    pad_n = n_chunks * chunk_size - N
    ref_p = jnp.pad(ref, ((0, pad_n), (0, 0)))
    mask_p = jnp.pad(ref_mask, (0, pad_n))
    ref_chunks = ref_p.reshape(n_chunks, chunk_size, 3)
    mask_chunks = mask_p.reshape(n_chunks, chunk_size)

    def tile_fn(q_tile):
        def scan_body(carry, inp):
            best_d, best_i = carry
            r_c, m_c, c_start = inp
            d2 = _pairwise_dist2(q_tile, r_c)
            d2 = jnp.where(m_c[None, :], d2, _INF)
            cand_i = (
                jax.lax.broadcasted_iota(jnp.int32, (q_tile.shape[0], chunk_size), 1)
                + c_start
            )
            best_d, best_i = _merge_topk(best_d, best_i, d2, cand_i, k)
            return (best_d, best_i), None

        init = (
            jnp.full((q_tile.shape[0], k), _INF, jnp.float32),
            jnp.zeros((q_tile.shape[0], k), jnp.int32),
        )
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
        (best_d, best_i), _ = jax.lax.scan(
            scan_body, init, (ref_chunks, mask_chunks, starts)
        )
        return best_i, best_d

    n_tiles = -(-M // query_tile)
    pad_m = n_tiles * query_tile - M
    q_p = jnp.pad(query, ((0, pad_m), (0, 0)))
    q_tiles = q_p.reshape(n_tiles, query_tile, 3)
    idx_t, d_t = jax.lax.map(tile_fn, q_tiles)
    idx = idx_t.reshape(-1, k)[:M]
    dist2 = d_t.reshape(-1, k)[:M]
    return idx, dist2


def ball_query(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    radius: float,
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    min_radius: float = 0.0,
    **knn_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to k neighbors within [min_radius, radius] of each query.

    Equivalent of libs/pointops/src/ball_query + torch_points_kernels
    ``tp.ball_query`` (used by PDF pseudo-labeling,
    recognizers/ours/pointpdf_v1m1_base.py:122-149). Realised as masked kNN:
    the k nearest are found, then those outside the annulus are invalidated.
    Returns (idx (M,k) int32, neighbor_mask (M,k) bool); invalid slots hold
    the query's own first valid neighbor index (self-padding).

    Note: distances come from the matmul identity, which carries ~1e-6
    absolute noise at unit scale, so ``min_radius`` must be >= ~1e-3 to
    reliably exclude coincident points.
    """
    idx, dist2 = knn(query, ref, k, query_mask, ref_mask, **knn_kwargs)
    inside = (dist2 <= radius * radius) & (dist2 >= min_radius * min_radius)
    inside &= jnp.isfinite(dist2)
    first = idx[:, :1]
    idx = jnp.where(inside, idx, first)
    return idx, inside


def grouping(
    feat: jnp.ndarray,
    idx: jnp.ndarray,
    coord: Optional[jnp.ndarray] = None,
    new_coord: Optional[jnp.ndarray] = None,
    with_coord: bool = False,
) -> jnp.ndarray:
    """Gather neighbor features (M, K, C); optionally prepend relative xyz.

    Equivalent of libs/pointops grouping + the ``with_xyz`` composite
    (libs/pointops/functions/utils.py:5-121). Relative coords are
    ``ref_xyz[idx] - query_xyz`` as in knn_query_and_group.
    """
    grouped = feat[idx]  # (M, K, C) gather
    if with_coord:
        assert coord is not None and new_coord is not None
        rel = coord[idx] - new_coord[:, None, :]  # (M, K, 3)
        grouped = jnp.concatenate([rel, grouped], axis=-1)
    return grouped


def interpolation(
    src_coord: jnp.ndarray,
    dst_coord: jnp.ndarray,
    src_feat: jnp.ndarray,
    k: int = 3,
    src_mask: Optional[jnp.ndarray] = None,
    dst_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
    **knn_kwargs,
) -> jnp.ndarray:
    """k-NN inverse-distance-weighted feature upsampling.

    Equivalent of libs/pointops/src/interpolation (k=3 IDW): for each dst
    point find the k nearest valid src points and blend their features with
    1/d weights normalized to sum 1.
    """
    idx, dist2 = knn(dst_coord, src_coord, k, dst_mask, src_mask, **knn_kwargs)
    valid = jnp.isfinite(dist2)
    w = 1.0 / (jnp.sqrt(jnp.maximum(dist2, 0.0)) + eps)
    w = jnp.where(valid, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), eps)
    neighbors = src_feat[idx]  # (M, k, C)
    return jnp.sum(neighbors * w[..., None].astype(neighbors.dtype), axis=-2)


def _merge_topk_unique(d1, i1, d2, i2, k: int):
    """Merge two (M, k) candidate sets keeping the k smallest UNIQUE
    indices (duplicate rediscoveries must not squat on top-k slots)."""
    all_d = jnp.concatenate([d1, d2], axis=-1)               # (M, 2k)
    all_i = jnp.concatenate([i1, i2], axis=-1)
    sort_ord = jnp.argsort(all_d, axis=-1)
    sd = jnp.take_along_axis(all_d, sort_ord, axis=-1)
    si = jnp.take_along_axis(all_i, sort_ord, axis=-1)
    earlier = (si[:, :, None] == si[:, None, :]) & jnp.tril(
        jnp.ones((2 * k, 2 * k), bool), k=-1)[None]
    sd = jnp.where(jnp.any(earlier, axis=-1), _INF, sd)
    neg, keep = jax.lax.top_k(-sd, k)
    return -neg, jnp.take_along_axis(si, keep, axis=-1)


def knn_serial(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: Optional[jnp.ndarray] = None,
    window: int = 128,
    orders: Tuple[str, ...] = ("z", "z-trans", "hilbert"),
    tile: int = 512,
    rescue_frac: float = 0.125,
    n_probe: int = 256,
    refine_steps: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Serialization-window kNN — the TPU fast path.

    The brute-force path materializes an (M, N) distance matrix (4.3 GB
    at a 32k ScanNet fragment — ~70% of the PT-v1 forward), and
    gather-based spatial hashing lowers to scalar-ish row fetches that
    crawl on TPU.  This path uses only TPU-fast primitives:

    1. points are sorted along several space-filling curves (z, x/y-
       swapped z, hilbert — ops/serialization.py, the same family PT-v3
       serializes attention with);
    2. each sorted query tile scores a CONTIGUOUS window of
       ``tile + 2*window`` sorted refs — one dynamic slice + one MXU
       distance block, no gathers;
    3. per-curve top-k results merge with index dedup; curve diversity
       covers what any single curve's discontinuities miss;
    4. rows whose k-th found distance exceeds a probe-estimated radius
       bound are repaired by a brute-force rescue pass over the worst
       ``rescue_frac`` fraction (static shape).

    Cross-set queries (FPS downsample, interpolation) rank themselves
    into the ref ordering by binary search on the curve codes.

    Measured distance-recall vs float64 ground truth (defaults,
    tests/test_ops_geometry.py::TestKnnSerial): ~0.97 uniform-3D (the
    hardest case for curve locality), ~0.98 voxelized surface scans,
    >=0.99 cross-set FPS/interp shapes and outdoor aspect ratios.  The
    fused-brute path (~0.997) wins below ~131k refs — this path exists
    for the full-scene eval fragments where O(M*N) is unpayable.

    Returns (idx (M, k) int32, dist2 (M, k) f32) ascending; slots beyond
    the found candidates hold dist2 == +inf (same contract as ``knn``).
    """
    from .serialization import MORTON_BITS, serialize_code

    M, N = query.shape[0], ref.shape[0]
    is_self = query is ref
    query = jnp.asarray(query, jnp.float32)
    ref = query if is_self else jnp.asarray(ref, jnp.float32)
    if ref_mask is None:
        ref_mask = jnp.ones((N,), bool)

    big = jnp.float32(3e38)
    cmin = jnp.min(jnp.where(ref_mask[:, None], ref, big), axis=0)
    cmin = jnp.where(cmin < 1e38, cmin, 0.0)
    cmax = jnp.max(jnp.where(ref_mask[:, None], ref, -big), axis=0)
    extent = jnp.maximum(jnp.max(cmax - cmin), 1e-6)
    scale = ((1 << MORTON_BITS) - 1) / extent

    def quantize(pts):
        return jnp.clip((pts - cmin) * scale, 0,
                        (1 << MORTON_BITS) - 1).astype(jnp.int32)

    rg = quantize(ref)
    qg = quantize(query)

    w = window
    # a tile of `tile` curve-ordered queries spans ~tile*N/M consecutive
    # sorted-ref ranks (self-kNN: exactly tile; FPS/interp cross sets:
    # proportionally more/less), plus the +-window margin
    spread = -(-tile * N // max(M, 1))
    span = min(N, spread + 2 * w)
    n_tiles = -(-M // tile)
    m_pad = n_tiles * tile

    best_d = jnp.full((M, k), _INF, jnp.float32)
    best_i = jnp.zeros((M, k), jnp.int32)

    for order in orders:
        rcode = serialize_code(rg, order)
        rcode = jnp.where(ref_mask, rcode, jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(rcode).astype(jnp.int32)
        sref = ref[perm]
        svalid = ref_mask[perm]
        scode = rcode[perm]

        if is_self:
            # queries ARE the refs: their curve rank is their own sorted
            # position — no binary search (measured ~126 ns/lookup, the
            # single most expensive primitive in this path)
            qorder = perm
            sq = sref
            srank = jnp.arange(M, dtype=jnp.int32)
        else:
            qcode = serialize_code(qg, order)
            rank = jnp.searchsorted(scode, qcode).astype(jnp.int32)
            qorder = jnp.argsort(rank).astype(jnp.int32)
            sq = query[qorder]
            srank = rank[qorder]

        sq_pad = jnp.pad(sq, ((0, m_pad - M), (0, 0)), mode="edge")
        srank_pad = jnp.pad(srank, (0, m_pad - M), mode="edge")

        def tile_fn(inp):
            q_tile, rank_tile = inp
            # center the window on the tile's rank range
            mid = (rank_tile[0] + rank_tile[-1]) // 2
            s0 = jnp.clip(mid - span // 2, 0, max(N - span, 0))
            win = jax.lax.dynamic_slice(sref, (s0, 0), (span, 3))
            wvalid = jax.lax.dynamic_slice(svalid, (s0,), (span,))
            d2 = _pairwise_dist2(q_tile, win)
            d2 = jnp.where(wvalid[None, :], d2, _INF)
            kk = min(k, d2.shape[1])
            # approx_min_k: the TPU PartialReduce unit; lax.top_k would
            # full-sort every window row
            vals, sel = jax.lax.approx_min_k(d2, kk, recall_target=0.99)
            gpos = s0 + sel
            if kk < k:
                gpos = jnp.pad(gpos, ((0, 0), (0, k - kk)), mode="edge")
                vals = jnp.pad(vals, ((0, 0), (0, k - kk)),
                               constant_values=jnp.inf)
            return perm[gpos], vals

        q_tiles = sq_pad.reshape(n_tiles, tile, 3)
        r_tiles = srank_pad.reshape(n_tiles, tile)
        idx_t, d_t = jax.lax.map(tile_fn, (q_tiles, r_tiles))
        idx_o = idx_t.reshape(m_pad, k)[:M]
        d_o = d_t.reshape(m_pad, k)[:M]
        # back to original query order
        inv = jnp.zeros((M,), jnp.int32).at[qorder].set(
            jnp.arange(M, dtype=jnp.int32))
        idx_o = idx_o[inv]
        d_o = d_o[inv]
        best_d, best_i = _merge_topk_unique(best_d, best_i, d_o, idx_o, k)

    for _ in range(refine_steps if is_self else 0):
        # NN-descent refinement: near-miss true neighbors are almost
        # always neighbors of found neighbors, so one
        # neighbors-of-neighbors expansion recovers what every curve
        # window missed.  Self-kNN only (idx indexes ref, hops need
        # query==ref semantics to stay meaningful — they do, since hops
        # are evaluated by true distance to the query).
        hop = best_i[best_i.reshape(-1)].reshape(M, k * k)     # (M, k*k)
        hop_pts = ref[hop.reshape(-1)].reshape(M, k * k, 3)
        hd2 = jnp.sum((query[:, None, :] - hop_pts) ** 2, axis=-1)
        hd2 = jnp.where(ref_mask[hop.reshape(-1)].reshape(M, k * k),
                        hd2, _INF)
        # dedup against current best, then against other hops, via the
        # unique merge applied per k-slice
        for s in range(k):
            best_d, best_i = _merge_topk_unique(
                best_d, best_i, hd2[:, s * k:(s + 1) * k],
                hop[:, s * k:(s + 1) * k], k)

    if rescue_frac > 0.0:
        # probe-based radius bound: rows whose found k-th neighbor is
        # farther than the sampled p95 exact radius are suspect (their
        # true neighborhood may straddle curve discontinuities)
        stride = max(N // n_probe, 1)
        probes = ref[::stride][:n_probe]
        pd2 = _pairwise_dist2(probes, ref)
        pd2 = jnp.where(ref_mask[None, :], pd2, _INF)
        neg, _ = jax.lax.top_k(-pd2, min(k, N))
        radii2 = -neg[:, -1]
        radii2 = jnp.where(jnp.isfinite(radii2), radii2, 0.0)
        bound = 1.2 * jnp.percentile(radii2, 95.0)
        kth = best_d[:, k - 1]
        suspect = (~jnp.isfinite(kth) | (kth > bound)).astype(jnp.float32)

        r = min(max(int(M * rescue_frac), 1), M)
        score, rows = jax.lax.top_k(suspect, r)
        q_bad = query[rows]
        b_idx, b_d2 = _knn_tpu_approx(q_bad, ref, min(k, N), ref_mask)
        if b_idx.shape[1] < k:
            pad = k - b_idx.shape[1]
            b_idx = jnp.pad(b_idx, ((0, 0), (0, pad)), mode="edge")
            b_d2 = jnp.pad(b_d2, ((0, 0), (0, pad)),
                           constant_values=jnp.inf)
        improved = b_d2[:, -1] < best_d[rows][:, -1]
        use = ((score > 0.0) & improved)[:, None]
        best_i = best_i.at[rows].set(jnp.where(use, b_idx, best_i[rows]))
        best_d = best_d.at[rows].set(jnp.where(use, b_d2, best_d[rows]))
    return best_i, best_d


def _knn_tpu_approx(query, ref, k, ref_mask, query_tile=8192,
                    ref_chunk=65536):
    """Tiled kNN on the TPU approx-top-k unit.

    Per (query tile, ref chunk) block the MXU distance identity feeds
    ``lax.approx_min_k`` DIRECTLY — the validity mask folds into the
    precomputed ``||r||^2`` term as a +3e38 penalty, because a separate
    ``where`` pass between matmul and select broke the fusion and
    materialized the full (M, N) distance matrix (4.3 GB at a 32k
    fragment; measured 30.4 -> 15.7 ms/sample after folding).
    """
    M, N = query.shape[0], ref.shape[0]
    k = min(k, N)
    ref_chunk = min(ref_chunk, N)      # never pad small problems UP
    query_tile = min(query_tile, M)
    center = jnp.mean(ref, axis=0, keepdims=True)  # see _pairwise_dist2
    query = query - center
    ref = ref - center
    # invalid refs get +inf-like distance through the r2 term (no extra
    # elementwise pass over the (M, N) block)
    r2 = jnp.sum(ref * ref, axis=-1) + jnp.where(ref_mask, 0.0,
                                                 jnp.float32(3e38))

    n_chunks = -(-N // ref_chunk)
    pad_n = n_chunks * ref_chunk - N
    ref_p = jnp.pad(ref, ((0, pad_n), (0, 0)))
    r2_p = jnp.pad(r2, (0, pad_n), constant_values=3e38)
    kc = min(k, ref_chunk)

    # index-in-mantissa packing: approx_min_k's index output path costs
    # ~2.5x its value-only path (measured 134 vs 53 ms for a batch-4
    # 32k self-kNN), so the ref's chunk-local index is packed into the
    # low mantissa bits of the non-negative distance float (IEEE bits of
    # positive floats are order-preserving) and only VALUES are
    # selected.  Distances lose their low ``idx_bits`` mantissa bits
    # (<=0.4% relative truncation at a 64k chunk) — consumers use d2 for
    # masks/weights/ordering where that is noise.
    idx_bits = max((ref_chunk - 1).bit_length(), 1)
    idx_mask = jnp.int32((1 << idx_bits) - 1)

    def block(q_tile, r_c, r2_c):
        q2 = jnp.sum(q_tile * q_tile, axis=-1, keepdims=True)
        d2 = q2 + r2_c[None, :] - 2.0 * jnp.dot(
            q_tile, r_c.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(d2, 0.0)
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        key = jax.lax.bitcast_convert_type((bits & ~idx_mask) | col,
                                           jnp.float32)
        v, _ = jax.lax.approx_min_k(key, kc, recall_target=0.99)
        kb = jax.lax.bitcast_convert_type(v, jnp.int32)
        idx = kb & idx_mask
        d2k = jax.lax.bitcast_convert_type(kb & ~idx_mask, jnp.float32)
        return d2k, idx

    def finalize(v):
        # consumers mask by isfinite: restore +inf where the penalty hit
        v = jnp.where(v < jnp.float32(1e37), v, _INF)
        return jnp.maximum(v, 0.0)

    if n_chunks == 1:
        def tile_fn(q_tile):
            d2k, i = block(q_tile, ref_p, r2_p)
            return i, finalize(d2k)
    else:
        ref_chunks = ref_p.reshape(n_chunks, ref_chunk, 3)
        r2_chunks = r2_p.reshape(n_chunks, ref_chunk)
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * ref_chunk

        def tile_fn(q_tile):
            def chunk_fn(carry, inp):
                r_c, r2_c, start = inp
                d2k, i = block(q_tile, r_c, r2_c)
                return carry, (d2k, i + start)

            _, (vs, is_) = jax.lax.scan(
                chunk_fn, 0, (ref_chunks, r2_chunks, starts))
            all_v = jnp.moveaxis(vs, 0, 1).reshape(q_tile.shape[0], -1)
            all_i = jnp.moveaxis(is_, 0, 1).reshape(q_tile.shape[0], -1)
            neg_v, pos = jax.lax.top_k(-all_v, k)  # tiny width: cheap
            return (jnp.take_along_axis(all_i, pos, axis=-1),
                    finalize(-neg_v))

    n_tiles = -(-M // query_tile)
    pad_m = n_tiles * query_tile - M
    q_p = jnp.pad(query, ((0, pad_m), (0, 0)))
    q_tiles = q_p.reshape(n_tiles, query_tile, 3)
    idx_t, d_t = jax.lax.map(tile_fn, q_tiles)
    return idx_t.reshape(-1, k)[:M], d_t.reshape(-1, k)[:M]


# --------------------------------------------------------------------------
# batched (vmap) wrappers over a leading batch dimension
# --------------------------------------------------------------------------

def knn_batched(query, ref, k, query_mask=None, ref_mask=None, **kw):
    fn = functools.partial(knn, k=k, **kw)
    return jax.vmap(fn)(query, ref, query_mask=query_mask, ref_mask=ref_mask)


def ball_query_batched(query, ref, radius, k, query_mask=None, ref_mask=None, **kw):
    fn = functools.partial(ball_query, radius=radius, k=k, **kw)
    return jax.vmap(fn)(query, ref, query_mask=query_mask, ref_mask=ref_mask)


def grouping_batched(feat, idx, coord=None, new_coord=None, with_coord=False):
    if with_coord:
        return jax.vmap(
            functools.partial(grouping, with_coord=True)
        )(feat, idx, coord, new_coord)
    return jax.vmap(grouping)(feat, idx)


def interpolation_batched(src_coord, dst_coord, src_feat, k=3,
                          src_mask=None, dst_mask=None, **kw):
    fn = functools.partial(interpolation, k=k, **kw)
    return jax.vmap(fn)(src_coord, dst_coord, src_feat,
                        src_mask=src_mask, dst_mask=dst_mask)
