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


def hilbert_encode(grid_coord: jnp.ndarray,
                   bits: int = MORTON_BITS) -> jnp.ndarray:
    """Hilbert-curve codes via Skilling's axes->transpose transform.

    grid_coord (..., 3) non-negative ints (clipped to ``bits`` bits);
    returns uint32 codes whose ordering follows the 3D Hilbert curve —
    better locality than z-order, used by PT-v3's 'hilbert' orders
    (reference pointcept/models/utils/serialization/hilbert.py).
    Vectorized: the bit loop unrolls statically, all lanes in parallel.
    """
    g = jnp.clip(grid_coord, 0, (1 << bits) - 1).astype(jnp.uint32)
    x = [g[..., 0], g[..., 1], g[..., 2]]

    # static python loop bounds so the transform unrolls under jit
    for shift in range(bits - 1, 0, -1):
        q = jnp.uint32(1 << shift)
        p = q - jnp.uint32(1)
        for i in range(3):
            hit = (x[i] & q) != 0
            # invert x[0] low bits, or exchange low bits of x[0] and x[i]
            inv = x[0] ^ p
            t = (x[0] ^ x[i]) & p
            x0_ex, xi_ex = x[0] ^ t, x[i] ^ t
            x[0] = jnp.where(hit, inv, x0_ex)
            if i != 0:
                x[i] = jnp.where(hit, x[i], xi_ex)

    # Gray encode
    x[1] = x[1] ^ x[0]
    x[2] = x[2] ^ x[1]
    t = jnp.zeros_like(x[0])
    for shift in range(bits - 1, 0, -1):
        q = jnp.uint32(1 << shift)
        t = jnp.where((x[2] & q) != 0, t ^ (q - jnp.uint32(1)), t)
    x = [xi ^ t for xi in x]

    # interleave transposed bits, axis 0 most significant per triple
    return (
        (_part1by2_u32(x[0]) << 2)
        | (_part1by2_u32(x[1]) << 1)
        | _part1by2_u32(x[2])
    )


def serialize_code(grid_coord: jnp.ndarray, order: str = "z") -> jnp.ndarray:
    """(..., 3) int grid -> (...,) uint32 code for the named curve order.

    Orders follow the reference naming (serialization/default.py:10-24):
    'z', 'z-trans' (x/y swapped), 'hilbert', 'hilbert-trans'.
    """
    order = order.replace("_", "-")
    if order.endswith("-trans"):
        grid_coord = grid_coord[..., jnp.array([1, 0, 2])]
        order = order[: -len("-trans")]
    if order == "z":
        return morton_encode(grid_coord)
    if order == "hilbert":
        return hilbert_encode(grid_coord)
    raise NotImplementedError(f"unknown serialization order: {order}")
