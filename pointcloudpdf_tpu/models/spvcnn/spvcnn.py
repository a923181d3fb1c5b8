"""SPVCNN: sparse voxel U-Net interleaved with a point-wise branch.

TPU-native re-design of the reference SPVCNN
(pointcept/models/spvcnn/ts_spvcnn.py:178-438, built on torchsparse).
The defining trait vs a plain sparse U-Net is the *point branch*: full-
resolution point features are re-sampled from the voxel grid at three
junctions via trilinear devoxelization and carried forward through
point-wise MLPs, so fine geometry survives the coarse voxel bottleneck.

TPU re-expression:

- a "PointTensor" is the padded (B, N) point list itself; a level's
  "SparseTensor" is a fixed-capacity unique-voxel list (grid, mask) built
  with :func:`...ops.voxel.unique_parents` (stride-1 dedup for x0, 2x per
  stage after that, so level ``l``'s grid is ``original_grid >> l``);
- ``point_to_voxel`` (torchsparse spvoxelize, ts :43-74) = masked
  scatter-mean through the composed point->level slot map;
- ``voxel_to_point`` (spdevoxelize + calc_ti_weights, ts :78-122) =
  :func:`trilinear_devoxelize` — 8-corner trilinear gather where missing
  corners contribute zero weight, matching torchsparse's -1 handling;
- convs/downs/ups reuse the gather-GEMM/scatter machinery shared with
  SpUNet (sorted-hash neighbor tables, per-kernel-position scatters).
"""

from __future__ import annotations

import functools
import itertools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxel import (
    build_hash_table,
    flatten_neighbor_rows as _flatten_nbr,
    flatten_slot_map as _flatten_map,
    kernel_offsets,
    lookup_hash,
    neighbor_table,
    pack_grid,
    unique_parents,
)
from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..sparse_unet.spconv_unet import (
    BasicBlock,
    SparseDownConv,
    SparseInverseConv,
    SubMConv,
)

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def trilinear_devoxelize(point_grid, point_mask, level_grid, level_mask,
                         level_feat, stride: int):
    """Sample voxel features at full-resolution points, trilinearly.

    Per sample: ``point_grid`` (N, 3) original int voxel coords,
    ``level_grid`` (N, 3) unique voxels in units of ``stride``
    (= original >> log2(stride)), ``level_feat`` (N, C).  Each point reads
    the 8 voxels at the corners of its cell with weights
    ``prod(axis: frac if corner else 1-frac)``; absent corners contribute
    nothing (torchsparse calc_ti_weights/spdevoxelize semantics,
    ts_spvcnn.py:78-122).  At stride 1 this degenerates to reading the
    point's own voxel.
    """
    tables = build_hash_table(level_grid, level_mask)
    cell = point_grid // stride
    frac = (point_grid % stride).astype(jnp.float32) / float(stride)
    out = jnp.zeros((point_grid.shape[0], level_feat.shape[-1]),
                    level_feat.dtype)
    for corner in itertools.product((0, 1), repeat=3):
        delta = jnp.asarray(corner, jnp.int32)
        q = cell + delta
        r = lookup_hash(tables, pack_grid(q), n_rows=level_grid.shape[0])
        w = jnp.prod(jnp.where(delta == 1, frac, 1.0 - frac), axis=-1)
        w = jnp.where((r >= 0) & point_mask, w, 0.0)
        g = level_feat[jnp.maximum(r, 0)]
        out = out + g * w[:, None].astype(level_feat.dtype)
    return out


def _scatter_mean(feat, slot_flat, num_slots):
    """Masked scatter-mean of features onto slots (torchsparse spvoxelize,
    ts_spvcnn.py:25-39)."""
    valid = slot_flat >= 0
    idx = jnp.maximum(slot_flat, 0)
    w = valid.astype(feat.dtype)
    s = jnp.zeros((num_slots, feat.shape[-1]), feat.dtype).at[idx].add(
        feat * w[:, None]
    )
    cnt = jnp.zeros((num_slots,), feat.dtype).at[idx].add(w)
    return s / jnp.maximum(cnt[:, None], 1.0)


def _compose(child_map, parent_map):
    """(B*N,) slot-map composition with -1 propagation."""
    r = parent_map[jnp.maximum(child_map, 0)]
    return jnp.where(child_map >= 0, r, -1)


class _ConvBNRelu(nn.Module):
    """Submanifold conv + BN + ReLU (BasicConvolutionBlock with stride 1,
    ts_spvcnn.py:125-137)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool):
        y = SubMConv(self.in_channels, self.out_channels, nbr.shape[-1],
                     name="conv")(feat, nbr)
        y = MaskedBatchNorm(self.out_channels, momentum=0.01, epsilon=1e-3,
                            name="bn")(y, mask, train)
        return jnp.where(mask[:, None], nn.relu(y), 0.0)


class _PointMLP(nn.Module):
    """Dense + BN + ReLU over valid points (point_transforms,
    ts_spvcnn.py:360-377)."""

    out_channels: int

    @nn.compact
    def __call__(self, feat, mask, train: bool):
        y = nn.Dense(self.out_channels, kernel_init=_trunc02, name="fc")(feat)
        y = MaskedBatchNorm(self.out_channels, momentum=0.01, epsilon=1e-3,
                            name="bn")(y, mask, train)
        return jnp.where(mask[:, None], nn.relu(y), 0.0)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    in_channels: int
    out_channels: int
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True):
        assert len(self.layers) % 2 == 0
        assert len(self.layers) == len(self.channels)
        grid = input_dict["grid_coord"].astype(jnp.int32)   # (B, N, 3)
        feat = input_dict["feat"]                           # (B, N, C)
        pmask = input_dict["mask"]                          # (B, N)
        b, n = pmask.shape
        off3 = kernel_offsets(3)
        ch = list(self.channels)
        bn = functools.partial(MaskedBatchNorm, momentum=0.01, epsilon=1e-3)
        flat_pmask = pmask.reshape(b * n)

        def make_nbr(g, m):
            return _flatten_nbr(
                jax.vmap(lambda gg, mm: neighbor_table(gg, mm, off3))(g, m)
            )

        def devox(level_grid, level_mask, level_feat, stride):
            return jax.vmap(
                lambda pg, pm, lg, lm, lf: trilinear_devoxelize(
                    pg, pm, lg, lm, lf, stride
                )
            )(grid, pmask, level_grid, level_mask,
              level_feat.reshape(b, n, -1)).reshape(b * n, -1)

        # ---- initial voxelization: dedup stride-1 voxels (ts :25-39) ----
        v_grid, v_mask, p2v0 = jax.vmap(
            lambda g, m: unique_parents(g, m, 1)
        )(grid, pmask)
        flat_vmask = v_mask.reshape(b * n)
        p2level = [_flatten_map(p2v0)]      # point -> level-s slot, s=0..4
        level_grids, level_masks = [v_grid], [v_mask]
        x = _scatter_mean(feat.reshape(b * n, -1), p2level[0], b * n)

        # ---- stem: two 3^3 subm convs (ts :260-267) ----
        nbr0 = make_nbr(v_grid, v_mask)
        x = _ConvBNRelu(self.in_channels, self.base_channels,
                        name="stem0")(x, nbr0, flat_vmask, train)
        x0 = _ConvBNRelu(self.base_channels, self.base_channels,
                         name="stem1")(x, nbr0, flat_vmask, train)

        # point branch t=0: z0 = devoxelize(x0) at stride 1 (ts :404-405)
        z0 = devox(v_grid, v_mask, x0, 1)

        # ---- encoder: 4 stages of [down ks2 s2, residual x layers[s]]
        # (ts :269-331); stage 1 consumes z0 re-voxelized (ts :407) ----
        x = _scatter_mean(z0, p2level[0], b * n)
        skips = [(x0, flat_vmask, nbr0)]
        down_maps = []
        for s in range(4):
            g, m = level_grids[-1], level_masks[-1]
            pos = (
                (g[..., 0] % 2) * 4 + (g[..., 1] % 2) * 2 + (g[..., 2] % 2)
            ).reshape(b * n)
            p_grid, p_mask, c2p = jax.vmap(
                lambda gg, mm: unique_parents(gg, mm, 2)
            )(g, m)
            c2p_flat = _flatten_map(c2p)
            valid = c2p_flat >= 0
            flat_p_mask = p_mask.reshape(b * n)
            y = SparseDownConv(x.shape[-1], x.shape[-1], name=f"down{s}")(
                x, c2p_flat, pos, valid, b * n
            )
            y = bn(y.shape[-1], name=f"down_bn{s}")(y, flat_p_mask, train)
            y = jnp.where(flat_p_mask[:, None], nn.relu(y), 0.0)
            nbr = make_nbr(p_grid, p_mask)
            for i in range(self.layers[s]):
                y = BasicBlock(y.shape[-1], ch[s], name=f"enc{s}_block{i}")(
                    y, nbr, flat_p_mask, train
                )
            down_maps.append((c2p_flat, pos, valid))
            p2level.append(_compose(p2level[-1], c2p_flat))
            level_grids.append(p_grid)
            level_masks.append(p_mask)
            skips.append((y, flat_p_mask, nbr))
            x = y

        # point branch t=1: z1 = devoxelize(x4, stride 16) + MLP(z0)
        # (ts :408-409)
        z1 = devox(level_grids[4], level_masks[4], x, 16)
        z1 = z1 + _PointMLP(ch[3], name="point_transform0")(
            z0, flat_pmask, train
        )

        def up_stage(y, stage, out_ch, blocks, name):
            c2p_flat, pos, valid = down_maps[stage]
            skip_feat, skip_mask, skip_nbr = skips[stage]
            y = SparseInverseConv(y.shape[-1], out_ch, name=f"{name}_conv")(
                y, c2p_flat, pos, valid
            )
            y = bn(out_ch, name=f"{name}_bn")(y, skip_mask, train)
            y = jnp.where(skip_mask[:, None], nn.relu(y), 0.0)
            y = jnp.concatenate([y, skip_feat], axis=-1)
            for i in range(blocks):
                y = BasicBlock(y.shape[-1], out_ch,
                               name=f"{name}_block{i}")(
                    y, skip_nbr, skip_mask, train
                )
            return y

        def dropout(v):
            return nn.Dropout(0.3, deterministic=not train)(v)

        # y1/y2: re-voxelize z1 at stride 16, dropout, two up stages
        # (ts :411-418)
        y = _scatter_mean(z1, p2level[4], b * n)
        y = dropout(y)
        y = up_stage(y, 3, ch[4], self.layers[4], "up0")
        y = up_stage(y, 2, ch[5], self.layers[5], "up1")

        # point branch t=2 at stride 4 + MLP(z1) (ts :419-420)
        z2 = devox(level_grids[2], level_masks[2], y, 4)
        z2 = z2 + _PointMLP(ch[5], name="point_transform1")(
            z1, flat_pmask, train
        )

        # y3/y4: re-voxelize z2 at stride 4, dropout, two up stages
        # (ts :422-427)
        y = _scatter_mean(z2, p2level[2], b * n)
        y = dropout(y)
        y = up_stage(y, 1, ch[6], self.layers[6], "up2")
        y = up_stage(y, 0, ch[7], self.layers[7], "up3")

        # point branch t=3 at stride 1 + classifier (ts :428-433)
        z3 = devox(level_grids[0], level_masks[0], y, 1)
        z3 = z3 + _PointMLP(ch[7], name="point_transform2")(
            z2, flat_pmask, train
        )
        out = nn.Dense(self.out_channels, kernel_init=_trunc02,
                       name="classifier")(z3)
        out = jnp.where(flat_pmask[:, None], out, 0.0)
        return out.reshape(b, n, -1)
