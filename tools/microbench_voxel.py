"""Microbenchmark the voxel-hash neighbor machinery on the TPU.

PT-v3's profile (tools/profile_ptv3.py) shows the 3^3 neighbor_table
build+probe at ~125 ms/call @ 4x32768 — the full forward is essentially
neighbor-table construction.  This times each primitive in isolation to
pick the redesign:

- scatter-build vs lookup split of the current 3-table hash,
- raw per-element gather / scatter / searchsorted rates,
- a 2-table (cuckoo-style) lookup,
- contiguous slice gathers (the z-adjacency idea: dz in {-1,0,1}
  neighbors of one (dx,dy) probe differ by +-1 in the packed key, so a
  z-major table could serve 3 probes with one 3-wide slice),
- the symmetric-offset inversion (13 lookups + 13 scatter inversions
  instead of 26 lookups).

Usage: python tools/microbench_voxel.py [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4
N = 32768
K3 = 27


def timed(fn, *args, iters, label):
    import jax

    out = fn(*args)
    _ = np.asarray(jax.device_get(out)).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(out)).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {dt * 1e3:9.3f} ms/call")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.ops.voxel import (
        build_hash_table, kernel_offsets, lookup_hash, neighbor_table,
        pack_grid)

    print(f"backend={jax.default_backend()}  B={B} N={N}")
    rng = np.random.RandomState(0)

    # surface-sheet grids (the regime indoor fragments live in)
    side = int(np.ceil(np.sqrt(N)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    grids = np.zeros((B, N, 3), np.int32)
    for bi in range(B):
        dz = rng.randint(-1, 2, (side, side))
        z = np.clip(np.cumsum(np.cumsum(dz, axis=0), axis=1) // 4, 0, 255)
        g = np.stack([xs, ys, z], axis=-1).reshape(-1, 3)
        grids[bi] = g[rng.permutation(side * side)[:N]]
    grid = jnp.asarray(grids)
    mask = jnp.ones((B, N), bool)
    off3 = kernel_offsets(3)

    H = 2 * N  # load-2 table size
    rand_idx = jnp.asarray(
        rng.randint(0, H + 1, (B, K3 * N)).astype(np.int32))
    rand_q = jnp.asarray(
        rng.randint(0, 1 << 31, (B, K3 * N)).astype(np.uint32))
    table1 = jnp.asarray(rng.randint(0, 1 << 31, (B, H + 1)).astype(np.uint32))
    vals = jnp.asarray(rng.rand(B, N).astype(np.float32))
    scat_idx = jnp.asarray(rng.randint(0, H, (B, N)).astype(np.int32))

    # --- current composite -------------------------------------------------
    timed(jax.jit(jax.vmap(lambda g, m: neighbor_table(g, m, off3))),
          grid, mask, iters=iters, label="neighbor_table 3^3 (current)")

    # --- build vs lookup split --------------------------------------------
    build = jax.jit(jax.vmap(build_hash_table))
    tables = build(grid, mask)
    timed(build, grid, mask, iters=iters, label="build_hash_table (3 rounds)")

    def queries(g, m):
        q_grid = g[:, None, :] + off3[None, :, :]
        in_b = jnp.all(q_grid >= 0, axis=-1)
        return jnp.where(in_b & m[:, None],
                         pack_grid(jnp.maximum(q_grid, 0)),
                         jnp.uint32(0xFFFFFFFF)).reshape(-1)

    qk = jax.jit(jax.vmap(queries))(grid, mask)
    timed(jax.jit(jax.vmap(lambda t, q: lookup_hash(t, q, n_rows=N))),
          tables, qk, iters=iters, label="lookup_hash 27N x 3 tables")
    timed(jax.jit(jax.vmap(
        lambda t, q: lookup_hash(t[:2], q, n_rows=N))),
        tables, qk, iters=iters, label="lookup_hash 27N x 2 tables")
    timed(jax.jit(jax.vmap(
        lambda t, q: lookup_hash(t[:1], q, n_rows=N))),
        tables, qk, iters=iters, label="lookup_hash 27N x 1 table")

    # --- raw primitive rates ----------------------------------------------
    timed(jax.jit(jax.vmap(lambda t, i: t[i])), table1, rand_idx,
          iters=iters, label="raw gather 27N x 1 (random)")
    timed(jax.jit(jax.vmap(
        lambda t, i: t[jnp.clip(i[:, None] + jnp.arange(4)[None, :],
                                0, H)])),
        table1, rand_idx, iters=iters,
        label="raw gather 27N x 4-contig slice")

    def slice_gather(t, i):
        # lax.gather with slice size 4 along the last dim
        idx = jnp.clip(i, 0, H - 3)[:, None]
        return jax.lax.gather(
            t, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(4,), mode="clip")

    timed(jax.jit(jax.vmap(slice_gather)), table1, rand_idx,
          iters=iters, label="lax.gather 27N slices of 4")

    timed(jax.jit(jax.vmap(
        lambda v, i: jnp.zeros((H + 1,), jnp.float32).at[i].set(v))),
        vals, scat_idx, iters=iters, label="raw scatter N .at[].set")
    timed(jax.jit(jax.vmap(
        lambda v, i: jnp.zeros((H + 1,), jnp.float32).at[i].add(v))),
        vals, scat_idx, iters=iters, label="raw scatter N .at[].add")

    skeys = jnp.sort(rand_q, axis=-1)
    timed(jax.jit(jax.vmap(jnp.searchsorted)), skeys, rand_q,
          iters=iters, label="searchsorted 27N in 27N")

    # --- symmetric inversion: 13 lookups + 13 scatter inversions ----------
    off13 = off3[:13]  # the 13 "negative" offsets; +13 mirror by symmetry

    def nbr_sym(g, m):
        tabs = build_hash_table(g, m)
        q_grid = g[:, None, :] + off13[None, :, :]
        in_b = jnp.all(q_grid >= 0, axis=-1)
        q = jnp.where(in_b & m[:, None],
                      pack_grid(jnp.maximum(q_grid, 0)),
                      jnp.uint32(0xFFFFFFFF)).reshape(-1)
        fwd = lookup_hash(tabs, q, n_rows=N).reshape(N, 13)
        rows = jnp.arange(N, dtype=jnp.int32)
        # invert: nbr[j, 26-k] = i where fwd[i, k] = j
        inv = jnp.full((13, N + 1), -1, jnp.int32)
        inv = inv.at[jnp.arange(13)[None, :],
                     jnp.where(fwd >= 0, fwd, N)].set(
            jnp.broadcast_to(rows[:, None], (N, 13)))
        bwd = inv[:, :N].T[:, ::-1]                       # (N, 13)
        return jnp.concatenate(
            [fwd, rows[:, None], bwd], axis=1)

    timed(jax.jit(jax.vmap(nbr_sym)), grid, mask, iters=iters,
          label="neighbor_table via 13 lookups + inversion")


if __name__ == "__main__":
    main()
