"""Point subsampling: exact and blocked farthest point sampling.

TPU-native replacement for the reference FPS CUDA kernel
(libs/pointops/src/sampling/sampling_cuda_kernel.cu:14-129, one block per
batch item running m sequential min-distance/argmax rounds).

Exact FPS is inherently sequential (m dependent steps), so it is expressed
as a ``lax.fori_loop`` with a masked argmax — fine for small m. For the
large encoder downsamplings (m up to N/4 with N ~ 10^5) we provide
*blocked FPS*: points are serialized along a morton curve, split into G
spatially-coherent groups, and exact FPS runs in all groups at once via
vmap, cutting the sequential depth from m to m/G. This trades exactness for
~G-fold parallelism while preserving FPS's blue-noise coverage, because the
morton groups tile space.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .serialization import morton_sort_indices


def farthest_point_sampling(
    coord: jnp.ndarray,
    m: int,
    mask: Optional[jnp.ndarray] = None,
    start_idx: int = 0,
) -> jnp.ndarray:
    """Exact FPS of m points from a padded (N, 3) set; returns (m,) int32.

    Invalid (masked) points are never selected while any unselected valid
    point remains; if m exceeds the number of valid points, selections
    degenerate to repeats of valid points (callers mask them out via the
    downsampled validity count).

    On TPU, large problems dispatch to the Pallas kernel
    (ops/pallas_fps.py), which keeps the running distance vector in VMEM
    across all m rounds (~5x faster than the lax loop at 64k points).
    Small per-group calls (blocked FPS windows) stay on the lax path,
    where XLA's fused loop beats the kernel's fixed overheads.
    """
    if (
        jax.default_backend() == "tpu"
        and coord.shape[0] >= 8192
        and m >= 512
    ):
        from .pallas_fps import farthest_point_sampling_pallas

        return farthest_point_sampling_pallas(coord, m, mask, start_idx)
    N = coord.shape[0]
    coord = jnp.asarray(coord, jnp.float32)
    if mask is None:
        mask = jnp.ones((N,), bool)
    else:
        mask = jnp.asarray(mask)

    # running min squared distance to the selected set; invalid points get
    # -inf so argmax never picks them while a valid candidate exists
    init_dist = jnp.where(mask, jnp.float32(1e10), -jnp.inf)
    idxs = jnp.zeros((m,), jnp.int32).at[0].set(start_idx)

    def body(i, carry):
        dist, idxs = carry
        last = coord[idxs[i - 1]]
        d = jnp.sum((coord - last[None, :]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -jnp.inf))
        nxt = jnp.argmax(dist).astype(jnp.int32)
        return dist, idxs.at[i].set(nxt)

    _, idxs = jax.lax.fori_loop(1, m, body, (init_dist, idxs))
    return idxs


def blocked_farthest_point_sampling(
    coord: jnp.ndarray,
    m: int,
    mask: Optional[jnp.ndarray] = None,
    num_groups: Optional[int] = None,
    max_group_steps: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Morton-blocked approximate FPS; returns (idx (m,), valid (m,)).

    Points are sorted along the z-order curve with invalid points last, so
    the first ``v`` sorted slots are the real points. The valid prefix is
    covered by ``num_groups`` windows of dynamic start but static width
    (ceil(v/G) points each, gathered through a clipped index window), and
    exact FPS selects m/num_groups points inside every window in parallel
    via vmap. Sequential depth drops from m to m/num_groups while morton
    windows keep each group spatially coherent, preserving FPS's blue-noise
    coverage. Duplicate selections (possible when v < m) are flagged
    invalid so downstream masks stay exact.
    """
    N = coord.shape[0]
    coord = jnp.asarray(coord, jnp.float32)
    if mask is None:
        mask = jnp.ones((N,), bool)
    else:
        mask = jnp.asarray(mask)
    if num_groups is None:
        num_groups = max(1, -(-m // max_group_steps))
    # static divisibility: shrink num_groups until it divides both m and N
    while m % num_groups != 0 or N % num_groups != 0:
        num_groups -= 1
    G = num_groups
    k_g = m // G
    g_size = N // G  # static window width; always >= ceil(v/G)

    if G == 1:
        # single group: exact sequential FPS in the reference kernel's
        # order — start at the first point, no morton shuffle (parity
        # with sampling_cuda_kernel.cu:39 ``idx[start_m] = start_n``;
        # valid points are a prefix under the padded-batch contract, so
        # index 0 is the segment-first point)
        idx = farthest_point_sampling(coord, m, mask)
        valid = mask[idx]
        sort_ord = jnp.argsort(idx)
        idx_sorted = idx[sort_ord]
        dup_sorted = jnp.concatenate(
            [jnp.zeros((1,), bool), idx_sorted[1:] == idx_sorted[:-1]]
        )
        dup = jnp.zeros((m,), bool).at[sort_ord].set(dup_sorted)
        return idx, valid & ~dup

    order = morton_sort_indices(coord, mask)          # (N,) valid-first
    sorted_coord = coord[order]

    v = jnp.sum(mask).astype(jnp.int32)               # number of valid points
    q = (v + G - 1) // G                              # per-window valid quota
    starts = jnp.clip(jnp.arange(G, dtype=jnp.int32) * q, 0, jnp.maximum(v - q, 0))
    window = starts[:, None] + jnp.arange(g_size, dtype=jnp.int32)[None, :]
    local_valid = (jnp.arange(g_size, dtype=jnp.int32)[None, :] < q) & (window < v)
    window = jnp.clip(window, 0, N - 1)               # (G, g_size) sorted pos
    coord_g = sorted_coord[window]                    # (G, g_size, 3)

    picks = jax.vmap(lambda c, mk: farthest_point_sampling(c, k_g, mk))(
        coord_g, local_valid
    )  # (G, k_g) local window positions
    pos = jnp.take_along_axis(window, picks, axis=-1).reshape(-1)  # sorted pos
    idx = order[pos]
    valid = mask[idx]
    # flag duplicate picks invalid (first occurrence in sorted-pos order wins)
    sort_ord = jnp.argsort(pos)
    pos_sorted = pos[sort_ord]
    dup_sorted = jnp.concatenate(
        [jnp.zeros((1,), bool), pos_sorted[1:] == pos_sorted[:-1]]
    )
    dup = jnp.zeros((m,), bool).at[sort_ord].set(dup_sorted)
    return idx, valid & ~dup


def downsample_count(valid_count: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Per-sample downsampled valid count, mirroring the reference's
    ``n_o[i] = o[i] // stride`` rule (point_transformer_seg.py:96-100)."""
    return jnp.maximum(valid_count // stride, 1)
