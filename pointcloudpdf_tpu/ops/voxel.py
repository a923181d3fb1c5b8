"""Sparse-voxel indexing: hash tables, neighbor maps, pooling maps.

TPU-native replacement for spconv's rulebook machinery (used by the
reference SpUNet, pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:
113-227).  A "sparse tensor" here is a padded dense list: ``grid`` (N, 3)
int32 voxel coordinates + ``mask`` (N,) validity.  All maps are built with
sort + binary search inside jit — static shapes, no host round-trips:

- submanifold conv: ``neighbor_table`` gives, per voxel, the index of the
  voxel at each kernel offset (or -1) — conv = Σ_k gather·W_k;
- strided conv: ``unique_parents`` dedups ``grid // stride`` into a
  fixed-capacity parent set + child→parent map — downsample = scatter of
  children onto parents per kernel position;
- inverse conv: the same child→parent map read backwards.

Keys pack into uint32 as x(11) y(11) z(10) bits, bounding the voxel
extent to 2048×2048×1024 per sample — ample for indoor scans and for
outdoor datasets at their configured grid sizes (SemanticKITTI ±50 m at
0.05 m → 2000 cells).  Callers must shift grids non-negative
(GridSample already emits min-shifted coords, datasets/transform.py).
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

X_BITS, Y_BITS, Z_BITS = 11, 11, 10


def pack_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) non-negative int voxel coords -> (N,) uint32 keys."""
    g = grid.astype(jnp.uint32)
    return (
        (g[..., 0] << (Y_BITS + Z_BITS)) | (g[..., 1] << Z_BITS) | g[..., 2]
    )


_INVALID_KEY = jnp.uint32(0xFFFFFFFF)


def build_table(grid: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted key table: (keys_sorted (N,), row_of_key (N,)).

    Invalid slots get the max key so they sort last and never match a
    query (valid keys cannot reach 0xFFFFFFFF given the bit budget).
    """
    keys = jnp.where(mask, pack_grid(grid), _INVALID_KEY)
    order = jnp.argsort(keys)
    return keys[order], order.astype(jnp.int32)


def lookup(table_keys: jnp.ndarray, table_rows: jnp.ndarray,
           query_keys: jnp.ndarray) -> jnp.ndarray:
    """Binary-search each query key; returns row index or -1."""
    pos = jnp.searchsorted(table_keys, query_keys)
    pos = jnp.clip(pos, 0, table_keys.shape[0] - 1)
    hit = table_keys[pos] == query_keys
    return jnp.where(hit, table_rows[pos], -1).astype(jnp.int32)


_HASH_MULT = jnp.uint32(2654435761)          # Knuth multiplicative hash
_HASH_SALTS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)
_CHECK_SALT = jnp.uint32(0x165667B1)
_EMPTY_ENTRY = jnp.uint32(0xFFFFFFFF)


def _hash_slot(keys, salt, shift):
    return (((keys ^ salt) * _HASH_MULT) >> shift).astype(jnp.int32)


def _row_bits(n: int) -> int:
    """Bits of a packed entry spent on the row index for an n-row
    sample; the remaining 32 - row_bits bits hold the verification tag.

    16 row bits up to 65536 rows (16-bit tag), then grows with n; the
    1M cap keeps >= 12 tag bits (false-positive ~2^-12 per slot
    collision — still well under the accepted approx-kNN noise)."""
    assert n <= (1 << 20), "hash entries keep >= 12 verification bits"
    return max(16, (n - 1).bit_length() if n > 1 else 1)


def _hash_check(keys, tag_bits: int):
    """Independent ``tag_bits``-bit verification tag in
    [0, 2^tag_bits - 2] (all-ones is the empty-slot sentinel's tag)."""
    tag = ((keys * _HASH_MULT) ^ _CHECK_SALT) >> (32 - tag_bits)
    return (tag % jnp.uint32((1 << tag_bits) - 1)).astype(jnp.uint32)


def build_hash_table(grid: jnp.ndarray, mask: jnp.ndarray,
                     n_tables: int = 3, load: int = 2) -> jnp.ndarray:
    """Multi-round scatter-built voxel hash -> (T, H+1) packed entries.

    ``searchsorted`` lookups cost ~200 ns each on this TPU — the 27xN
    (3^3) / 125xN (5^3) rulebook queries made ``neighbor_table`` ~85% of
    the SpUNet forward (profiled 0.7 s / 3.7 s per batch).  Scalar
    gathers run at ~10 ns, so each probe must be ONE gather: a slot
    packs a verification tag (an independent hash of the key) with the
    row index — the bit split adapts to n via ``_row_bits`` so large
    collation buckets (131072/262144-point SphereCrop capacities) pack
    too — and the table is built by ``n_tables`` scatter rounds — round
    t scatters the still-unplaced keys at ``hash_t``, reading back to
    find colliding-write losers, which move to round t+1.  At load 1/2
    the unplaced fraction after 3 rounds is ~1e-4 (a lost key's voxel
    is invisible to neighbor gathers — masked, not corrupt), and a
    lookup false-positive needs a slot collision AND a tag collision
    (<= ~2^-12 per probe): both are far below the approx-kNN noise
    already accepted elsewhere.  Slot H is a dummy that absorbs parked
    rows.
    """
    n = grid.shape[0]
    rb = _row_bits(n)
    h_bits = max((load * n - 1).bit_length(), 4)
    h = 1 << h_bits
    shift = 32 - h_bits
    keys = jnp.where(mask, pack_grid(grid), _INVALID_KEY)
    entry = (_hash_check(keys, 32 - rb) << rb) | jnp.arange(
        n, dtype=jnp.uint32)

    tables = []
    pending = mask
    for t in range(n_tables):
        salt = jnp.uint32(_HASH_SALTS[t % len(_HASH_SALTS)])
        slot = _hash_slot(keys, salt, shift)
        slot = jnp.where(pending, slot, h)           # parked in the dummy
        tab = jnp.full((h + 1,), _EMPTY_ENTRY).at[slot].set(entry)
        stored = pending & (tab[jnp.minimum(slot, h)] == entry) & (slot < h)
        pending = pending & ~stored
        tables.append(tab)
    return jnp.stack(tables)


def lookup_hash(tables: jnp.ndarray, query_keys: jnp.ndarray,
                n_rows: Optional[int] = None) -> jnp.ndarray:
    """Row index for each query key via the scatter-built tables (-1 if
    absent); one gather per probe.  ``n_rows`` is the row count the
    table was built with (defaults to the <=65536 16-bit legacy split);
    it must match build_hash_table's n for the tag compare to align."""
    h = tables.shape[1] - 1
    shift = 32 - (h - 1).bit_length() if h > 1 else 31
    rb = _row_bits(n_rows) if n_rows is not None else 16
    check = _hash_check(query_keys, 32 - rb)
    valid = query_keys != _INVALID_KEY
    res = jnp.full(query_keys.shape, -1, jnp.int32)
    for t in range(tables.shape[0]):
        salt = jnp.uint32(_HASH_SALTS[t % len(_HASH_SALTS)])
        slot = _hash_slot(query_keys, salt, shift)
        e = tables[t][slot]
        hit = ((e >> rb) == check) & valid
        res = jnp.where((res < 0) & hit,
                        (e & jnp.uint32((1 << rb) - 1)).astype(jnp.int32),
                        res)
    return res


def raster_sort(grid: jnp.ndarray, mask: jnp.ndarray,
                extent: Optional[Tuple[int, int, int]] = None,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample raster-key sort permutation (valid first).

    Returns (perm (N,) int32 positions into the unsorted arrays, inv (N,)
    where each unsorted point landed, sorted_mask (N,)).  Sorting by the
    packed key makes the row index equal the raster *rank*, which is what
    the dense occupancy probes (:func:`neighbor_table_dense`) and the
    sort-free pooling (:func:`unique_parents_sorted`) return — the
    one-time sort replaces a per-level O(N log N) with O(N) maps
    everywhere below.

    When ``extent`` is given, valid points outside it are masked off and
    sorted last (the dense rank==row invariant tolerates no mid-array
    holes); callers should surface the drop count.
    """
    n = grid.shape[0]
    keep = mask
    if extent is not None:
        keep = keep & jnp.all(grid >= 0, axis=-1) & jnp.all(
            grid < jnp.asarray(extent, grid.dtype)[None, :], axis=-1)
    keys = jnp.where(keep, pack_grid(grid), _INVALID_KEY)
    perm = jnp.argsort(keys).astype(jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv, keep[perm]


def unique_parents_sorted(grid: jnp.ndarray, mask: jnp.ndarray, stride: int,
                          capacity: Optional[int] = None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`unique_parents` with one argsort instead of two sorts + a
    searchsorted sweep.

    (Child raster order does NOT imply parent raster order under
    ``// stride`` — ``x // 2`` collapses x-distinctions and lets lower
    axes reorder — so one argsort over the parent keys is irreducible.)
    After it, dedup is an adjacent-compare + cumsum-rank + two scatters:
    ~10x cheaper than the sort-based form on TPU
    (tools/microbench_voxel.py).  Parents come out raster-sorted, which
    is the row invariant :func:`neighbor_table_dense` needs at the next
    level; masked slots may sit anywhere in the input.
    """
    n = grid.shape[0]
    cap = n if capacity is None else min(capacity, n)
    p_grid_all = grid // stride
    keys = jnp.where(mask, pack_grid(p_grid_all), _INVALID_KEY)
    perm = jnp.argsort(keys).astype(jnp.int32)      # valid first, sorted
    k_s = keys[perm]
    m_s = mask[perm]
    is_first = jnp.concatenate(
        [m_s[:1], (k_s[1:] != k_s[:-1]) & m_s[1:]])
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1          # (N,)
    num_parents = jnp.sum(is_first)
    overflow = rank >= cap
    scatter_slot = jnp.where(is_first & ~overflow, rank, cap)
    parent_grid = jnp.zeros((cap + 1, 3), jnp.int32).at[scatter_slot].set(
        p_grid_all[perm])[:cap]
    parent_mask = jnp.arange(cap) < jnp.minimum(num_parents, cap)
    parent_grid = jnp.where(parent_mask[:, None], parent_grid, 0)
    c2p_sorted = jnp.where(m_s & ~overflow, rank, -1).astype(jnp.int32)
    child_to_parent = jnp.zeros((n,), jnp.int32).at[perm].set(c2p_sorted)
    return parent_grid, parent_mask, child_to_parent


def build_occupancy(grid: jnp.ndarray, mask: jnp.ndarray,
                    extent: Tuple[int, int, int]) -> jnp.ndarray:
    """Dense z-column occupancy+rank array for raster-sorted points.

    Returns (X, Y, W, 2) int32 where W = ceil(Z/32) + 1 (one zero guard
    word): ``[..., 0]`` is the number of occupied cells in raster order
    *before* this 32-cell z-word (== the row index of this word's first
    occupied cell, because rows are raster ranks), ``[..., 1]`` the
    occupancy bits.  One 4-int32 contiguous slice gather at
    ``[x, y, w0]`` yields rank+bits for two adjacent words — enough to
    resolve all dz in [-2, 2] of a (dx, dy) probe group
    (:func:`neighbor_table_dense`).

    TPU rationale: per-element random gathers run at ~10 ns on this v5e
    while a 4-wide contiguous slice costs about the same, so collapsing
    the 3 (dz) x 3 (hash tables) = 9 gathers of the hash formulation
    into one slice gather per (dx, dy) group is ~9x on the dominant
    rulebook cost (tools/microbench_voxel.py).
    """
    x_ext, y_ext, z_ext = extent
    w = -(-z_ext // 32) + 1                      # + zero guard word
    flat_words = jnp.zeros((x_ext * y_ext * w,), jnp.uint32)
    g = grid
    # out-of-extent points must not alias into other slots: like a
    # hash-parked key they become invisible as neighbors (their own
    # probes still resolve via the bounds checks in the lookup)
    ok = (mask & jnp.all(g >= 0, axis=-1)
          & (g[:, 0] < x_ext) & (g[:, 1] < y_ext) & (g[:, 2] < z_ext))
    # guard duplicate cells (the GridSample contract forbids them, but a
    # double-scattered bit would ADD into a carry and corrupt the word —
    # skip non-first duplicates instead; adjacent compare suffices on
    # raster-sorted input)
    keys = pack_grid(jnp.maximum(g, 0))
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (keys[1:] == keys[:-1])])
    ok = ok & ~dup
    word_idx = (g[:, 0] * y_ext + g[:, 1]) * w + (g[:, 2] >> 5)
    bit = jnp.uint32(1) << (g[:, 2] & 31).astype(jnp.uint32)
    # each valid cell is unique (GridSample dedups), so add == or
    flat_words = flat_words.at[
        jnp.where(ok, word_idx, x_ext * y_ext * w)
    ].add(jnp.where(ok, bit, 0), mode="drop")
    counts = jax.lax.population_count(flat_words)
    rank = jnp.cumsum(counts) - counts           # exclusive prefix
    return jnp.stack(
        [rank.astype(jnp.int32),
         flat_words.astype(jnp.int32)], axis=-1
    ).reshape(x_ext, y_ext, w, 2)


def neighbor_table_dense(grid: jnp.ndarray, mask: jnp.ndarray,
                         offsets: jnp.ndarray,
                         extent: Tuple[int, int, int]) -> jnp.ndarray:
    """(N, K) neighbor rows via the dense occupancy array, -1 if absent.

    Drop-in for :func:`neighbor_table` when (a) the per-sample grid
    extent is statically bounded by ``extent`` and (b) rows are raster
    ranks (points sorted by :func:`raster_sort`).

    XLA gather cost on TPU is dominated by the START count, not bytes
    (~20M starts/s on this v5e), so the whole kernel footprint rides ONE
    strided slice gather per point: a (Sx, Sy, 2, 2) block of the
    zero-bordered occupancy covering every (dx, dy) column and both
    z-words (dz in [-2, 2]).  All per-offset resolution after that is
    static indexing + elementwise bit math — profiled 9x over the
    9-slab-gather grouping this replaces (3^3: ~55 -> ~6 ms at 4x32768;
    5^3 gathers 25x fewer starts).
    """
    x_ext, y_ext, z_ext = extent
    w = -(-z_ext // 32) + 1
    n, k = grid.shape[0], offsets.shape[0]
    off_np = np.asarray(offsets)
    assert int(off_np[:, 2].min()) >= -2 and int(off_np[:, 2].max()) <= 2, \
        "dense probes resolve dz in [-2, 2]"
    dx_min, dx_max = int(off_np[:, 0].min()), int(off_np[:, 0].max())
    dy_min, dy_max = int(off_np[:, 1].min()), int(off_np[:, 1].max())
    dz_min = int(off_np[:, 2].min())
    sx = dx_max - dx_min + 1
    sy = dy_max - dy_min + 1
    px, py = -dx_min, -dy_min

    occ = build_occupancy(grid, mask, extent)        # (X, Y, W, 2)
    # zero border: slice starts never clip, so the in-slab position of
    # cell (x+dx, y+dy) is the STATIC (dx - dx_min, dy - dy_min); border
    # words are all-zero -> no hit, matching the bounds masks below
    occ = jnp.pad(occ, ((px, sx - 1 - px), (py, sy - 1 - py),
                        (0, 0), (0, 0)))

    x, y, z = grid[:, 0], grid[:, 1], grid[:, 2]
    w0 = jnp.clip((z + dz_min) >> 5, 0, w - 2)
    starts = jnp.stack(
        [jnp.clip(x + dx_min + px, 0, occ.shape[0] - sx),
         jnp.clip(y + dy_min + py, 0, occ.shape[1] - sy),
         w0, jnp.zeros_like(x)], axis=-1)            # (N, 4)
    slab = jax.lax.gather(
        occ, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2, 3)),
        slice_sizes=(sx, sy, 2, 2), mode="clip")     # (N, Sx, Sy, 2, 2)

    cols = jnp.full((n, k), -1, jnp.int32)
    for ki in range(k):
        dx, dy, dz = (int(off_np[ki, 0]), int(off_np[ki, 1]),
                      int(off_np[ki, 2]))
        qx, qy, qz = x + dx, y + dy, z + dz
        cell = slab[:, dx - dx_min, dy - dy_min]     # (N, 2, 2)
        wsel = (qz >> 5) - w0
        ok = ((qx >= 0) & (qx < x_ext) & (qy >= 0) & (qy < y_ext)
              & (qz >= 0) & (qz < z_ext) & (wsel >= 0) & (wsel <= 1)
              & mask)
        in1 = wsel == 1
        rank = jnp.where(in1, cell[:, 1, 0], cell[:, 0, 0])
        word = jnp.where(in1, cell[:, 1, 1], cell[:, 0, 1]).astype(
            jnp.uint32)
        bit = (qz & 31).astype(jnp.uint32)
        hit = ((word >> bit) & 1).astype(bool) & ok
        below = jax.lax.population_count(
            word & ((jnp.uint32(1) << bit) - 1)).astype(jnp.int32)
        cols = cols.at[:, ki].set(jnp.where(hit, rank + below, -1))
    return cols


def kernel_offsets(kernel_size: int = 3) -> np.ndarray:
    """(K^3, 3) int32 offsets, centered (e.g. -1..1 for k=3).

    Returned as a host numpy array: jnp consumers convert transparently,
    while :func:`neighbor_table_dense` needs concrete values for its
    trace-time (dx, dy) probe grouping even when the caller is inside a
    jit trace (where a jnp constant would be a tracer)."""
    r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    return np.asarray(list(itertools.product(r, r, r)), np.int32)


def neighbor_table(grid: jnp.ndarray, mask: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """(N, K) neighbor row per kernel offset, -1 where absent.

    The submanifold-conv rulebook: out[i] = Σ_k W_k · feat[nbr[i, k]].
    Lookups go through the scatter-built hash (build_hash_table) — the
    sorted-table/searchsorted formulation cost ~200 ns per query on TPU,
    which at 27xN..125xN rulebook queries dominated the whole SpUNet
    forward.
    """
    n, k = grid.shape[0], offsets.shape[0]
    tables = build_hash_table(grid, mask)
    q_grid = grid[:, None, :] + offsets[None, :, :]          # (N, K, 3)
    in_bounds = jnp.all(q_grid >= 0, axis=-1)
    q_keys = jnp.where(
        in_bounds & mask[:, None],
        pack_grid(jnp.maximum(q_grid, 0)), _INVALID_KEY).reshape(-1)
    nbr = lookup_hash(tables, q_keys, n_rows=n).reshape(n, k)
    valid = mask[:, None] & in_bounds
    return jnp.where(valid, nbr, -1)


def unique_parents(grid: jnp.ndarray, mask: jnp.ndarray, stride: int,
                   capacity: Optional[int] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dedup ``grid // stride`` at fixed ``capacity`` (default N).

    Returns (parent_grid (cap, 3), parent_mask (cap,), child_to_parent
    (N,)): the first ``P`` slots hold the P unique parent voxels (sorted
    by key), and each valid child maps to its parent slot (-1 for
    padding).  A 2x voxel stride merges >=2x points per occupied parent
    on real surface scans, so ``capacity = N // 2`` is a safe static
    shrink; if the unique-parent count ever exceeds capacity, the excess
    parents (largest keys) are dropped and their children map to -1 —
    the overflow guard keeps index maps in range instead of corrupting.
    """
    n = grid.shape[0]
    cap = n if capacity is None else min(capacity, n)
    p_grid_all = grid // stride
    keys = jnp.where(mask, pack_grid(p_grid_all), _INVALID_KEY)
    sorted_keys = jnp.sort(keys)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != _INVALID_KEY)
    # compact unique keys to the front: a stable sort on (!is_first) moves
    # every first-occurrence slot forward while preserving key order, so
    # the prefix stays ascending and searchsorted below remains valid
    order = jnp.argsort(jnp.where(is_first, 0, 1), stable=True)
    parent_keys = jnp.where(
        jnp.arange(n) < jnp.sum(is_first), sorted_keys[order], _INVALID_KEY
    )[:cap]
    parent_mask = parent_keys != _INVALID_KEY
    # parents unpack from keys
    pk = parent_keys.astype(jnp.uint32)
    parent_grid = jnp.stack(
        [
            (pk >> (Y_BITS + Z_BITS)) & ((1 << X_BITS) - 1),
            (pk >> Z_BITS) & ((1 << Y_BITS) - 1),
            pk & ((1 << Z_BITS) - 1),
        ],
        axis=-1,
    ).astype(jnp.int32)
    parent_grid = jnp.where(parent_mask[:, None], parent_grid, 0)
    # child -> parent slot via binary search over parent_keys; children of
    # capacity-overflow parents miss the (truncated) table and stay -1
    child_keys = jnp.where(mask, pack_grid(p_grid_all), _INVALID_KEY)
    pos = jnp.searchsorted(parent_keys, child_keys)
    pos = jnp.clip(pos, 0, cap - 1)
    hit = (parent_keys[pos] == child_keys) & mask
    child_to_parent = jnp.where(hit, pos, -1).astype(jnp.int32)
    return parent_grid, parent_mask, child_to_parent


def gather_conv(feat: jnp.ndarray, nbr: jnp.ndarray, weights: jnp.ndarray,
                ) -> jnp.ndarray:
    """Gather-GEMM submanifold conv: out[i] = Σ_k feat[nbr[i,k]] @ W[k].

    feat (N, Cin), nbr (N, K) with -1 sentinels, weights (K, Cin, Cout).
    Accumulated with a scan over kernel offsets so peak memory stays
    O(N·C) instead of O(N·K·C) (K=125 for the stem's 5³ kernel); each
    step is one MXU GEMM.
    """
    n = feat.shape[0]
    c_out = weights.shape[-1]

    def body(acc, inp):
        nbr_k, w_k = inp                                   # (N,), (Cin, Cout)
        g = feat[jnp.maximum(nbr_k, 0)]
        g = jnp.where((nbr_k >= 0)[:, None], g, 0.0)
        acc = acc + jnp.dot(
            g, w_k.astype(feat.dtype), preferred_element_type=jnp.float32
        ).astype(acc.dtype)
        return acc, None

    acc0 = jnp.zeros((n, c_out), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (nbr.T, weights))
    return acc.astype(feat.dtype)


def scatter_mean_to_parent(feat: jnp.ndarray, child_to_parent: jnp.ndarray,
                           num_parents: int) -> jnp.ndarray:
    """Mean-pool child features onto parent slots (max-capacity dense)."""
    valid = child_to_parent >= 0
    idx = jnp.maximum(child_to_parent, 0)
    w = valid.astype(feat.dtype)
    summed = jnp.zeros((num_parents, feat.shape[-1]), feat.dtype).at[idx].add(
        feat * w[:, None]
    )
    counts = jnp.zeros((num_parents,), feat.dtype).at[idx].add(w)
    return summed / jnp.maximum(counts[:, None], 1.0)


def flatten_neighbor_rows(nbr: jnp.ndarray) -> jnp.ndarray:
    """(B, N, K) per-sample rows -> (B*N, K) rows into the flat array."""
    b, n, k = nbr.shape
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    return jnp.where(nbr >= 0, nbr + base, -1).reshape(b * n, k)


def flatten_slot_map(idx: jnp.ndarray,
                     slot_count: Optional[int] = None) -> jnp.ndarray:
    """(B, N) per-sample slots -> (B*N,) flat slots (-1 kept).

    ``slot_count`` is the per-sample size of the *target* array (the
    parent capacity); defaults to N for same-size maps.
    """
    b, n = idx.shape
    stride = n if slot_count is None else slot_count
    base = (jnp.arange(b, dtype=jnp.int32) * stride)[:, None]
    return jnp.where(idx >= 0, idx + base, -1).reshape(b * n)
