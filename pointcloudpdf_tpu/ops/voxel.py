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


def _hash_check(keys):
    """Independent 16-bit verification tag in [0, 0xFFFE] (0xFFFF is the
    empty-slot sentinel's tag)."""
    tag = ((keys * _HASH_MULT) ^ _CHECK_SALT) >> 17
    return (tag % jnp.uint32(0xFFFF)).astype(jnp.uint32)


def build_hash_table(grid: jnp.ndarray, mask: jnp.ndarray,
                     n_tables: int = 3, load: int = 2) -> jnp.ndarray:
    """Multi-round scatter-built voxel hash -> (T, H+1) packed entries.

    ``searchsorted`` lookups cost ~200 ns each on this TPU — the 27xN
    (3^3) / 125xN (5^3) rulebook queries made ``neighbor_table`` ~85% of
    the SpUNet forward (profiled 0.7 s / 3.7 s per batch).  Scalar
    gathers run at ~10 ns, so each probe must be ONE gather: a slot
    packs a 16-bit verification tag (an independent hash of the key)
    with the 16-bit row, and the table is built by ``n_tables`` scatter
    rounds — round t scatters the still-unplaced keys at ``hash_t``,
    reading back to find colliding-write losers, which move to round
    t+1.  At load 1/2 the unplaced fraction after 3 rounds is ~1e-4
    (a lost key's voxel is invisible to neighbor gathers — masked, not
    corrupt), and a lookup false-positive needs a slot collision AND a
    tag collision (~1e-5 per probe): both are far below the approx-kNN
    noise already accepted elsewhere.  Slot H is a dummy that absorbs
    parked rows.
    """
    n = grid.shape[0]
    assert n <= (1 << 16), "packed rows are 16-bit per sample"
    h_bits = max((load * n - 1).bit_length(), 4)
    h = 1 << h_bits
    shift = 32 - h_bits
    keys = jnp.where(mask, pack_grid(grid), _INVALID_KEY)
    entry = (_hash_check(keys) << 16) | jnp.arange(n, dtype=jnp.uint32)

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


def lookup_hash(tables: jnp.ndarray, query_keys: jnp.ndarray
                ) -> jnp.ndarray:
    """Row index for each query key via the scatter-built tables (-1 if
    absent); one gather per probe."""
    h = tables.shape[1] - 1
    shift = 32 - (h - 1).bit_length() if h > 1 else 31
    check = _hash_check(query_keys)
    valid = query_keys != _INVALID_KEY
    res = jnp.full(query_keys.shape, -1, jnp.int32)
    for t in range(tables.shape[0]):
        salt = jnp.uint32(_HASH_SALTS[t % len(_HASH_SALTS)])
        slot = _hash_slot(query_keys, salt, shift)
        e = tables[t][slot]
        hit = ((e >> 16) == check) & valid
        res = jnp.where((res < 0) & hit,
                        (e & jnp.uint32(0xFFFF)).astype(jnp.int32), res)
    return res


def kernel_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K^3, 3) int32 offsets, centered (e.g. -1..1 for k=3)."""
    r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    return jnp.asarray(list(itertools.product(r, r, r)), jnp.int32)


def neighbor_table(grid: jnp.ndarray, mask: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """(N, K) neighbor row per kernel offset, -1 where absent.

    The submanifold-conv rulebook: out[i] = Σ_k W_k · feat[nbr[i, k]].
    Lookups go through the scatter-built hash (build_hash_table) — the
    sorted-table/searchsorted formulation cost ~200 ns per query on TPU,
    which at 27xN..125xN rulebook queries dominated the whole SpUNet
    forward.
    """
    tables = build_hash_table(grid, mask)
    n, k = grid.shape[0], offsets.shape[0]
    q_grid = grid[:, None, :] + offsets[None, :, :]          # (N, K, 3)
    in_bounds = jnp.all(q_grid >= 0, axis=-1)
    q_keys = jnp.where(
        in_bounds & mask[:, None],
        pack_grid(jnp.maximum(q_grid, 0)), _INVALID_KEY).reshape(-1)
    nbr = lookup_hash(tables, q_keys).reshape(n, k)
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
