"""OA-CNNs: omni-adaptive sparse CNNs.

Reference: pointcept/models/oacnns/oacnns_v1m1_base.py:13-345 (spconv +
torch_geometric).  TPU re-expression over the voxel-hash stack: the
multi-scale ``voxel_grid`` partitions become :func:`unique_parents` maps
at several grid sizes, the adaptive per-scale aggregation (softmax
attention inside each coarse cell) runs as masked segment sums at fixed
capacity, and the submanifold/strided/inverse convs reuse the SpUNet
machinery.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxel import (
    flatten_neighbor_rows,
    flatten_slot_map,
    kernel_offsets,
    neighbor_table,
    unique_parents,
)
from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..sparse_unet.spconv_unet import (
    SparseDownConv,
    SparseInverseConv,
    SubMConv,
    _trunc02,
)

_bn = functools.partial(MaskedBatchNorm, momentum=0.01, epsilon=1e-3)


def _segment_mean(x, seg, valid, capacity):
    w = valid.astype(jnp.float32)
    s = jnp.zeros((capacity, x.shape[-1]), jnp.float32).at[seg].add(
        x.astype(jnp.float32) * w[:, None]
    )
    c = jnp.zeros((capacity,), jnp.float32).at[seg].add(w)
    return (s / jnp.maximum(c[:, None], 1e-6)).astype(x.dtype)


def _segment_sum(x, seg, valid, capacity):
    w = valid.astype(x.dtype)
    return jnp.zeros((capacity, x.shape[-1]), x.dtype).at[seg].add(
        x * w[:, None]
    )


class AdaptiveBlock(nn.Module):
    """Reference BasicBlock (:13-111): multi-scale adaptive aggregation
    + two submanifold convs, double residual."""

    embed_channels: int
    num_scales: int

    @nn.compact
    def __call__(self, feat, nbr, clusters, mask, train: bool):
        c = self.embed_channels
        n = feat.shape[0]

        def mlp(x, name):
            y = nn.Dense(c, use_bias=False, kernel_init=_trunc02,
                         name=f"{name}_fc")(x)
            y = _bn(c, name=f"{name}_bn")(y, mask, train)
            return nn.relu(y)

        scale_feats = []
        for i, (seg, valid) in enumerate(clusters):
            pw = mlp(feat, f"lw{i}")
            pw = pw - _segment_mean(pw, seg, valid, n)[seg]
            pw = nn.Dense(c, use_bias=False, kernel_init=_trunc02,
                          name=f"weight{i}")(pw)
            pw = jnp.exp(pw - jax.lax.stop_gradient(pw.max()))
            denom = _segment_sum(pw, seg, valid, n)[seg] + 1e-6
            pw = pw / denom
            pfeat = mlp(feat, f"proj{i}") * pw
            pfeat = _segment_sum(pfeat, seg, valid, n)[seg]
            scale_feats.append(jnp.where(valid[:, None], pfeat, 0.0))

        adp = nn.Dense(self.num_scales, use_bias=False, kernel_init=_trunc02,
                       name="adaptive")(feat)
        adp = jax.nn.softmax(adp, axis=-1)
        stacked = jnp.stack(scale_feats, axis=1)          # (N, S, C)
        agg = jnp.einsum("ns,nsc->nc", adp, stacked)
        base = mlp(feat, "proj_last")
        fused = mlp(jnp.concatenate([base, agg], axis=-1), "fuse")
        feat = fused + feat

        res = feat
        k = nbr.shape[-1]
        y = SubMConv(c, c, k, name="conv1")(feat, nbr)
        y = _bn(c, name="bn1")(y, mask, train)
        y = nn.relu(y)
        y = SubMConv(c, c, k, name="conv2")(y, nbr)
        y = _bn(c, name="bn2")(y, mask, train)
        y = nn.relu(y + res)
        return jnp.where(mask[:, None], y, 0.0)


@MODELS.register_module("OACNNs")
@MODELS.register_module("OACNNs-v1m1")
class OACNNs(nn.Module):
    in_channels: int
    num_classes: int
    embed_channels: int = 64
    enc_num_ref: Sequence[int] = (16, 16, 16, 16)
    enc_channels: Sequence[int] = (64, 64, 128, 256)
    groups: Sequence[int] = (2, 4, 8, 16)
    enc_depth: Sequence[int] = (2, 3, 6, 4)
    down_ratio: Sequence[int] = (2, 2, 2, 2)
    dec_channels: Sequence[int] = (96, 96, 128, 256)
    point_grid_size: Sequence[Sequence[int]] = (
        (16, 32, 64), (8, 16, 24), (4, 8, 12), (2, 4, 6)
    )
    dec_depth: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True):
        grid = input_dict["grid_coord"].astype(jnp.int32)
        feat = input_dict["feat"]
        mask = input_dict["mask"]
        b, n = mask.shape
        num_stages = len(self.enc_channels)
        off3 = kernel_offsets(3)

        def stage_nbr(g, m):
            return flatten_neighbor_rows(
                jax.vmap(lambda gg, mm: neighbor_table(gg, mm, off3))(g, m)
            )

        flat_mask = mask.reshape(b * n)
        y = feat.reshape(b * n, -1)
        nbr = stage_nbr(grid, mask)
        in_ch = self.in_channels
        for i in range(3):  # stem: 3 x (SubMConv + BN + relu)
            y = SubMConv(in_ch, self.embed_channels, off3.shape[0],
                         name=f"stem{i}")(y, nbr)
            y = _bn(self.embed_channels, name=f"stem_bn{i}")(y, flat_mask,
                                                             train)
            y = nn.relu(y)
            in_ch = self.embed_channels
        y = jnp.where(flat_mask[:, None], y, 0.0)

        level = dict(grid=grid, mask=mask)
        skips = [(y, flat_mask, nbr)]
        down_maps = []
        enc_in = self.embed_channels
        for s in range(num_stages):
            pos = (
                (level["grid"][..., 0] % 2) * 4
                + (level["grid"][..., 1] % 2) * 2
                + (level["grid"][..., 2] % 2)
            ).reshape(b * n)
            p_grid, p_mask, c2p = jax.vmap(
                lambda g, m: unique_parents(g, m, 2)
            )(level["grid"], level["mask"])
            c2p_flat = flatten_slot_map(c2p)
            valid = c2p_flat >= 0
            flat_p_mask = p_mask.reshape(b * n)
            y = SparseDownConv(enc_in, self.enc_channels[s],
                               name=f"down{s}")(y, c2p_flat, pos, valid,
                                                b * n)
            y = _bn(self.enc_channels[s], name=f"down_bn{s}")(
                y, flat_p_mask, train
            )
            y = nn.relu(y)
            y = jnp.where(flat_p_mask[:, None], y, 0.0)
            down_maps.append((c2p_flat, pos, valid))
            level = dict(grid=p_grid, mask=p_mask)

            # multi-scale clusters over this level's voxel grid
            clusters = []
            for gsize in self.point_grid_size[s]:
                _, _, cc = jax.vmap(
                    lambda g, m, gs=gsize: unique_parents(g, m, gs)
                )(level["grid"], level["mask"])
                cc_flat = flatten_slot_map(cc)
                clusters.append((jnp.maximum(cc_flat, 0), cc_flat >= 0))

            lvl_nbr = stage_nbr(level["grid"], level["mask"])
            for d in range(self.enc_depth[s]):
                y = AdaptiveBlock(
                    self.enc_channels[s], len(self.point_grid_size[s]),
                    name=f"enc{s}_block{d}",
                )(y, lvl_nbr, clusters, flat_p_mask, train)
            skips.append((y, flat_p_mask, lvl_nbr))
            enc_in = self.enc_channels[s]

        y, cur_mask, _ = skips.pop()
        for s in reversed(range(num_stages)):
            skip_feat, skip_mask, _ = skips.pop()
            c2p_flat, pos, valid = down_maps[s]
            y = SparseInverseConv(y.shape[-1], self.dec_channels[s],
                                  name=f"up{s}")(y, c2p_flat, pos, valid)
            y = _bn(self.dec_channels[s], name=f"up_bn{s}")(y, skip_mask,
                                                            train)
            y = nn.relu(y)
            h = jnp.concatenate([y, skip_feat], axis=-1)
            h = nn.Dense(self.dec_channels[s], kernel_init=_trunc02,
                         name=f"fuse{s}_fc1")(h)
            h = _bn(self.dec_channels[s], name=f"fuse{s}_bn1")(h, skip_mask,
                                                               train)
            h = nn.relu(h)
            h = nn.Dense(self.dec_channels[s], kernel_init=_trunc02,
                         name=f"fuse{s}_fc2")(h)
            h = _bn(self.dec_channels[s], name=f"fuse{s}_bn2")(h, skip_mask,
                                                               train)
            y = nn.relu(h) + y
            cur_mask = skip_mask

        logits = nn.Dense(self.num_classes, kernel_init=_trunc02,
                          name="final")(y)
        logits = jnp.where(cur_mask[:, None], logits, 0.0)
        return logits.reshape(b, n, self.num_classes)
