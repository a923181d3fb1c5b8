"""OctFormer: dilated octree window attention with an FPN decoder.

TPU-native re-design of the reference OctFormer
(pointcept/models/octformer/octformer_v1m1_base.py:34-629, built on
ocnn/dwconv).  The reference builds a real octree; its non-empty nodes at
depth ``d`` are exactly the unique voxels of ``grid >> (D_max - d)``, so
the TPU build realises every octree operation on the padded unique-voxel
levels already used by SpUNet:

- octree convs (OctreeConvBnRelu / DWConv CPE) = gather-GEMM submanifold
  convs over sorted-hash neighbor tables; stride-2 octree conv =
  per-kernel-position scatter onto ``unique_parents``; nearest
  OctreeUpsample / OctreeInterp = reading the child→parent map backwards;
- **dilated patch attention** (the defining trait, reference
  OctreeAttention :196-274): nodes sort along the z-order (Morton) curve,
  pad to a multiple of ``patch_size * dilation``; a block of K·D
  consecutive nodes transposes into D patches of K nodes taking every
  D-th element — even blocks run dense (D=1) windows, odd blocks run the
  dilated ones.  Attention is masked dense MHA with the learned xyz RPE
  (pos_bnd = 0.8·K·√D, reference RPE :163-194);
- the decoder is the reference FPN (:380-428): per-stage 1x1 to
  ``fpn_channels``, running nearest-upsampled accumulator, 3x3 conv per
  depth, summed at the finest transformer depth, then ``head_up``
  deconvs back to the input resolution.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.serialization import morton_encode
from ...ops.voxel import (
    flatten_neighbor_rows as _flatten_nbr,
    flatten_slot_map as _flatten_map,
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
)

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _z_sort(grid, mask):
    """Per-sample z-order sort (valid first): (order, inverse), (B, N)."""
    code = jnp.where(mask, morton_encode(grid), jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(code, axis=-1).astype(jnp.int32)
    n = grid.shape[1]
    inverse = jax.vmap(
        lambda p: jnp.zeros((n,), jnp.int32).at[p].set(
            jnp.arange(n, dtype=jnp.int32)
        )
    )(order)
    return order, inverse


class OctreeDWConv(nn.Module):
    """Depthwise submanifold conv + BN (reference OctreeDWConvBn :143-161,
    the dwconv CPE)."""

    channels: int

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool):
        k = nbr.shape[-1]
        w = self.param("kernel", _trunc02, (k, self.channels))

        def body(acc, inp):
            nbr_k, w_k = inp
            g = feat[jnp.maximum(nbr_k, 0)]
            g = jnp.where((nbr_k >= 0)[:, None], g, 0.0)
            return acc + g * w_k[None, :].astype(feat.dtype), None

        acc0 = jnp.zeros_like(feat)
        y, _ = jax.lax.scan(body, acc0, (nbr.T, w))
        y = MaskedBatchNorm(self.channels, momentum=0.01, epsilon=1e-3,
                            name="bn")(y, mask, train)
        return jnp.where(mask[:, None], y, 0.0)


class OctreeRPE(nn.Module):
    """Learned per-axis relative-position tables (reference RPE :163-194):
    pos_bnd = 0.8 * patch_size * sqrt(dilation)."""

    patch_size: int
    num_heads: int
    dilation: int = 1

    @nn.compact
    def __call__(self, rel):
        pos_bnd = int(0.8 * self.patch_size * self.dilation ** 0.5)
        rpe_num = 2 * pos_bnd + 1
        table = self.param("rpe_table", _trunc02,
                           (3 * rpe_num, self.num_heads))
        idx = (
            jnp.clip(rel, -pos_bnd, pos_bnd)
            + pos_bnd
            + jnp.arange(3, dtype=rel.dtype) * rpe_num
        )
        bias = jnp.take(table, idx, axis=0).sum(-2)   # (..., K, K, H)
        return jnp.moveaxis(bias, -1, -3)             # (..., H, K, K)


class OctreeAttention(nn.Module):
    """Dilated z-order patch attention (reference :196-274)."""

    dim: int
    patch_size: int
    num_heads: int
    dilation: int = 1
    qkv_bias: bool = True
    use_rpe: bool = True

    @nn.compact
    def __call__(self, feat, grid, order, inverse, mask, train: bool):
        b, n = mask.shape
        k = self.patch_size
        d = self.dilation
        h = self.num_heads
        hd = self.dim // h
        block = k * d
        n_pad = -(-n // block) * block

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       kernel_init=_trunc02, name="qkv")(feat)
        qkv_s = jnp.take_along_axis(qkv, order[..., None], axis=1)
        mask_s = jnp.take_along_axis(mask, order, axis=1)
        grid_s = jnp.take_along_axis(grid, order[..., None], axis=1)
        if n_pad != n:
            qkv_s = jnp.pad(qkv_s, ((0, 0), (0, n_pad - n), (0, 0)))
            mask_s = jnp.pad(mask_s, ((0, 0), (0, n_pad - n)))
            grid_s = jnp.pad(grid_s, ((0, 0), (0, n_pad - n), (0, 0)))
        nb = n_pad // block

        # block of K*D consecutive -> D dilated patches of K (reference
        # view(-1, K, D, C).transpose(1, 2))
        def dilate(x):
            x = x.reshape((b, nb, k, d) + x.shape[2:])
            return jnp.moveaxis(x, 3, 2).reshape(
                (b, nb * d, k) + x.shape[4:]
            )

        qkv_p = dilate(qkv_s)                        # (B, P, K, 3C)
        mask_p = dilate(mask_s)                      # (B, P, K)
        grid_p = dilate(grid_s)                      # (B, P, K, 3)

        qkv_p = qkv_p.reshape(b, -1, k, 3, h, hd)
        q, kk, v = jnp.moveaxis(qkv_p, 3, 0)         # (B, P, K, H, hd)
        scale = hd ** -0.5
        logits = jnp.einsum(
            "bpkhd,bpmhd->bphkm", q.astype(jnp.float32) * scale,
            kk.astype(jnp.float32),
        )
        if self.use_rpe:
            rel = grid_p[:, :, :, None, :] - grid_p[:, :, None, :, :]
            logits = logits + OctreeRPE(
                self.patch_size, self.num_heads, self.dilation, name="rpe"
            )(rel).astype(logits.dtype)
        logits = jnp.where(mask_p[:, :, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bphkm,bpmhd->bpkhd", attn.astype(v.dtype), v)
        out = out.reshape(b, nb, d, k, self.dim)
        out = jnp.moveaxis(out, 2, 3).reshape(b, n_pad, self.dim)[:, :n]
        out = jnp.take_along_axis(out, inverse[..., None], axis=1)
        out = nn.Dense(self.dim, kernel_init=_trunc02, name="proj")(out)
        return jnp.where(mask[..., None], out, 0.0)


class OctFormerBlock(nn.Module):
    """CPE + attention + MLP with pre-norm residuals (reference :275-316)."""

    dim: int
    num_heads: int
    patch_size: int
    dilation: int
    mlp_ratio: float
    drop_path: float
    use_rpe: bool = True

    @nn.compact
    def __call__(self, feat, grid, nbr, order, inverse, mask, train: bool):
        b, n = mask.shape

        def dpath(x):
            if self.drop_path == 0.0 or not train:
                return x
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            m = jax.random.bernoulli(rng, keep, (b, 1, 1)).astype(x.dtype)
            return x * m / keep

        flat_mask = mask.reshape(b * n)
        y = OctreeDWConv(self.dim, name="cpe")(
            feat.reshape(b * n, -1), nbr, flat_mask, train
        ).reshape(b, n, -1)
        feat = feat + y

        y = nn.LayerNorm(name="norm1")(feat)
        y = OctreeAttention(
            self.dim, self.patch_size, self.num_heads, self.dilation,
            use_rpe=self.use_rpe, name="attn",
        )(y, grid, order, inverse, mask, train)
        feat = feat + dpath(y)

        y = nn.LayerNorm(name="norm2")(feat)
        y = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_trunc02,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, kernel_init=_trunc02, name="mlp_fc2")(y)
        feat = feat + dpath(y)
        return jnp.where(mask[..., None], feat, 0.0)


class _ConvBNRelu(nn.Module):
    """OctreeConvBnRelu k3 s1 (submanifold form)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool):
        y = SubMConv(self.in_channels, self.out_channels, nbr.shape[-1],
                     name="conv")(feat, nbr)
        y = MaskedBatchNorm(self.out_channels, momentum=0.01, epsilon=1e-3,
                            name="bn")(y, mask, train)
        return jnp.where(mask[:, None], nn.relu(y), 0.0)


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    in_channels: int
    num_classes: int
    fpn_channels: int = 168
    channels: Sequence[int] = (96, 192, 384, 384)
    num_blocks: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 24)
    patch_size: int = 26
    stem_down: int = 2
    head_up: int = 2
    dilation: int = 4
    drop_path: float = 0.5
    mlp_ratio: float = 4.0
    nempty: bool = True
    use_rpe: bool = True
    # accepted for config parity; GridSample provides the discretization
    octree_scale_factor: float = 10.24
    octree_depth: int = 11
    octree_full_depth: int = 2

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True):
        grid0 = input_dict["grid_coord"].astype(jnp.int32)   # (B, N, 3)
        feat = input_dict["feat"]                            # (B, N, C)
        mask0 = input_dict["mask"]                           # (B, N)
        b, n = mask0.shape
        num_stages = len(self.num_blocks)
        off3 = kernel_offsets(3)
        bn = functools.partial(MaskedBatchNorm, momentum=0.01, epsilon=1e-3)

        def make_nbr(g, m):
            return _flatten_nbr(
                jax.vmap(lambda gg, mm: neighbor_table(gg, mm, off3))(g, m)
            )

        # level ladder: stem_down + (num_stages - 1) stride-2 pools
        num_levels = self.stem_down + num_stages
        grids, masks, c2ps = [grid0], [mask0], []
        for _ in range(num_levels - 1):
            p_grid, p_mask, c2p = jax.vmap(
                lambda g, m: unique_parents(g, m, 2)
            )(grids[-1], masks[-1])
            c2ps.append(_flatten_map(c2p))
            grids.append(p_grid)
            masks.append(p_mask)

        def down(x, level, out_ch, name, with_relu):
            """Stride-2 octree conv + BN(+ReLU) level -> level+1."""
            g = grids[level]
            pos = (
                (g[..., 0] % 2) * 4 + (g[..., 1] % 2) * 2 + (g[..., 2] % 2)
            ).reshape(b * n)
            c2p_flat = c2ps[level]
            valid = c2p_flat >= 0
            pm = masks[level + 1].reshape(b * n)
            y = SparseDownConv(x.shape[-1], out_ch, name=f"{name}_conv")(
                x, c2p_flat, pos, valid, b * n
            )
            y = bn(out_ch, name=f"{name}_bn")(y, pm, train)
            if with_relu:
                y = nn.relu(y)
            return jnp.where(pm[:, None], y, 0.0)

        # ---- PatchEmbed (reference :430-479): conv+down x stem_down,
        # then a 3x3 proj at the transformer depth ----
        stem_ch = [
            int(self.channels[0] * 2 ** i)
            for i in range(-self.stem_down, 1)
        ]
        x = feat.reshape(b * n, -1)
        for i in range(self.stem_down):
            m = masks[i].reshape(b * n)
            x = _ConvBNRelu(x.shape[-1], stem_ch[i], name=f"stem_conv{i}")(
                x, make_nbr(grids[i], masks[i]), m, train
            )
            y = down(x, i, stem_ch[i + 1], f"stem_down{i}", with_relu=True)
            x = y
        base = self.stem_down                       # transformer start level
        nbr_base = make_nbr(grids[base], masks[base])
        x = _ConvBNRelu(x.shape[-1], self.channels[0], name="stem_proj")(
            x, nbr_base, masks[base].reshape(b * n), train
        )

        dpr = [
            self.drop_path * i / max(sum(self.num_blocks) - 1, 1)
            for i in range(sum(self.num_blocks))
        ]

        # ---- stages: dilated attention blocks + stride-2 downsample ----
        feats = {}
        x = x.reshape(b, n, -1)
        for s in range(num_stages):
            level = base + s
            g, m = grids[level], masks[level]
            nbr = make_nbr(g, m) if level != base else nbr_base
            order, inverse = _z_sort(g, m)
            for i in range(self.num_blocks[s]):
                x = OctFormerBlock(
                    self.channels[s], self.num_heads[s], self.patch_size,
                    1 if i % 2 == 0 else self.dilation, self.mlp_ratio,
                    dpr[sum(self.num_blocks[:s]) + i], self.use_rpe,
                    name=f"stage{s}_block{i}",
                )(x, g, nbr, order, inverse, m, train)
            feats[level] = (x, nbr)
            if s < num_stages - 1:
                x = down(
                    x.reshape(b * n, -1), level, self.channels[s + 1],
                    f"stage_down{s}", with_relu=False,
                ).reshape(b, n, -1)

        # ---- FPN decoder (reference :380-428), coarse -> fine ----
        def upsample(x, level):
            """Nearest octree upsample level -> level-1 (children read
            their parent)."""
            c2p_flat = c2ps[level - 1]
            y = x[jnp.maximum(c2p_flat, 0)]
            return jnp.where((c2p_flat >= 0)[:, None], y, 0.0)

        deepest = base + num_stages - 1
        feature = nn.Dense(self.fpn_channels, kernel_init=_trunc02,
                           name="fpn_1x1_0")(feats[deepest][0])
        feature = feature.reshape(b * n, -1)
        m = masks[deepest].reshape(b * n)
        conv_out = _ConvBNRelu(
            self.fpn_channels, self.fpn_channels, name="fpn_3x3_0"
        )(feature, feats[deepest][1], m, train)
        # running sum, expressed at the current depth and upsampled lazily
        out = conv_out
        out_level = deepest
        for i in range(1, num_stages):
            level = deepest - i
            feature = upsample(feature, level + 1)
            stage_feat, stage_nbr = feats[level]
            feature = feature + nn.Dense(
                self.fpn_channels, kernel_init=_trunc02, name=f"fpn_1x1_{i}"
            )(stage_feat).reshape(b * n, -1)
            m = masks[level].reshape(b * n)
            feature = jnp.where(m[:, None], feature, 0.0)
            conv_out = _ConvBNRelu(
                self.fpn_channels, self.fpn_channels, name=f"fpn_3x3_{i}"
            )(feature, stage_nbr, m, train)
            out = upsample(out, level + 1) + conv_out
            out_level = level

        # head_up deconvs back to the input resolution (reference :425-427)
        for i in range(self.head_up):
            level = out_level - 1
            g = grids[level]
            pos = (
                (g[..., 0] % 2) * 4 + (g[..., 1] % 2) * 2 + (g[..., 2] % 2)
            ).reshape(b * n)
            c2p_flat = c2ps[level]
            valid = c2p_flat >= 0
            m = masks[level].reshape(b * n)
            out = SparseInverseConv(
                self.fpn_channels, self.fpn_channels, name=f"head_up{i}_conv"
            )(out, c2p_flat, pos, valid)
            out = bn(self.fpn_channels, name=f"head_up{i}_bn")(out, m, train)
            out = jnp.where(m[:, None], nn.relu(out), 0.0)
            out_level = level
        assert out_level == 0, (out_level, self.stem_down, self.head_up)

        # seg head (reference :569-579)
        if self.num_classes > 0:
            m0 = mask0.reshape(b * n)
            y = nn.Dense(self.fpn_channels, kernel_init=_trunc02,
                         name="head_fc1")(out)
            y = bn(self.fpn_channels, name="head_bn")(y, m0, train)
            y = nn.relu(y)
            out = nn.Dense(self.num_classes, kernel_init=_trunc02,
                           name="head_fc2")(y)
        out = jnp.where(mask0.reshape(b * n)[:, None], out, 0.0)
        return out.reshape(b, n, -1)
