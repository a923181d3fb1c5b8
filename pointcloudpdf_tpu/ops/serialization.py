"""Space-filling-curve serialization (z-order) for point clouds.

TPU-first replacement for the reference's serialization utilities
(pointcept/models/utils/serialization/, z-order/Hilbert curves): codes are
computed with pure 32-bit integer jnp ops (JAX runs in 32-bit mode) so they
jit cleanly on TPU. Used by blocked FPS (spatially-coherent grouping) and by
serialized-attention models (PT-v3).

Codes use 10 bits per axis -> 30-bit keys in uint32, i.e. a 1024^3 grid,
which is ample for ordering purposes.
"""

from __future__ import annotations

import jax.numpy as jnp

MORTON_BITS = 10  # bits per axis; 3 * 10 = 30-bit codes fit uint32


def _part1by2_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x with 2 zero bits between each (uint32)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_encode(grid_coord: jnp.ndarray) -> jnp.ndarray:
    """Interleave 3D non-negative integer coords into z-order codes.

    grid_coord: (..., 3) int array; values are clipped to [0, 2**10 - 1].
    Returns uint32 codes with the same leading shape.
    """
    g = jnp.clip(grid_coord, 0, (1 << MORTON_BITS) - 1).astype(jnp.uint32)
    x = _part1by2_u32(g[..., 0])
    y = _part1by2_u32(g[..., 1])
    z = _part1by2_u32(g[..., 2])
    return x | (y << 1) | (z << 2)


def grid_coord_from_points(coord: jnp.ndarray, grid_size: float) -> jnp.ndarray:
    """Quantize float coords to non-negative integer grid coords."""
    shifted = coord - jnp.min(coord, axis=-2, keepdims=True)
    return jnp.floor(shifted / grid_size).astype(jnp.int32)


def morton_sort_indices(coord: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Indices sorting points by morton code, invalid points last.

    coord: (N, 3) float; mask: (N,) bool. Returns (N,) int32 permutation.
    """
    coord = jnp.asarray(coord, jnp.float32)
    mask = jnp.asarray(mask)
    cmin = jnp.min(jnp.where(mask[:, None], coord, jnp.inf), axis=0)
    cmax = jnp.max(jnp.where(mask[:, None], coord, -jnp.inf), axis=0)
    extent = jnp.maximum(jnp.max(cmax - cmin), 1e-6)
    scale = ((1 << MORTON_BITS) - 1) / extent
    g = jnp.clip((coord - cmin) * scale, 0, (1 << MORTON_BITS) - 1).astype(jnp.int32)
    code = morton_encode(g)
    code = jnp.where(mask, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(code).astype(jnp.int32)
