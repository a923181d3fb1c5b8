"""Point Transformer V2 (m2): grouped vector attention + grid pooling.

TPU-native re-design of the reference PT-v2
(pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py):
the pointops kNN/grouping CUDA calls become batched masked jnp ops over
padded (B, N) buffers, torch_geometric's voxel_grid partition pooling
becomes :func:`...ops.voxel.unique_parents` over per-stage voxel grids,
and the map-unpooling reads the child→parent cluster map backwards.
Grouped vector attention is fully dense masked einsum work that XLA
tiles onto MXU/VPU.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.geometry import grouping, knn
from ...ops.voxel import unique_parents
from ..builder import MODELS
from ..norm import MaskedBatchNorm
from ..utils.structure import masked_softmax

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)

# fused-GVA dispatch: "auto" uses the Pallas kernel for plain-BN
# inference on TPU, "off" forces the XLA einsum path, "interpret" runs
# the kernel in CPU interpret mode (tests)
import os as _os

FUSED_GVA = _os.environ.get("PCPDF_FUSED_GVA", "auto")


class GroupedVectorAttention(nn.Module):
    """Reference GVA (:48-130) over padded batches with neighbor masks."""

    embed_channels: int
    groups: int
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    norm: Optional[object] = None

    @nn.compact
    def __call__(self, feat, coord, ref_idx, ref_mask, mask, train: bool,
                 context=None):
        c = self.embed_channels
        g = self.groups
        bn = self.norm or MaskedBatchNorm

        def mlp2(x, m, width, name):
            y = nn.Dense(width, name=f"{name}_fc1")(x)
            y = bn(width, name=f"{name}_bn")(y, m, train, context)
            y = nn.relu(y)
            return y

        q = mlp2(nn.Dense(c, use_bias=self.qkv_bias, name="linear_q")(feat),
                 mask, c, "q")
        k = mlp2(nn.Dense(c, use_bias=self.qkv_bias, name="linear_k")(feat),
                 mask, c, "k")
        v = nn.Dense(c, use_bias=self.qkv_bias, name="linear_v")(feat)

        mode = FUSED_GVA
        use_fused = mode == "interpret" or (
            mode == "auto" and not train and context is None
            and self.norm is None and jax.default_backend() == "tpu"
        )
        if use_fused:
            # fused Pallas path (ops/pallas_gva.py): the pe/weight MLP
            # chains, softmax and grouped aggregation stay VMEM-resident
            # instead of materializing (B, N, S, C) intermediates; the
            # inference BNs fold to probed affines (same trick as the
            # PT-v1 kernel, modules.py)
            from ...ops.pallas_gva import fused_grouped_vector_attention
            from ..point_transformer.modules import _bn_affine, _dense_wb

            zero3c = (jnp.zeros((3, c), jnp.float32),
                      jnp.zeros((c,), jnp.float32))
            zerocc = (jnp.zeros((c, c), jnp.float32),
                      jnp.zeros((c,), jnp.float32))
            zc = jnp.zeros((c,), jnp.float32)
            if self.pe_multiplier:
                pm1 = _dense_wb(nn.Dense(c, name="pem_fc1"), 3)
                pem_s, pem_t = _bn_affine(bn(c, name="pem_bn"), c)
                pm2 = _dense_wb(nn.Dense(c, name="pem_fc2"), c)
            else:
                pm1, pm2, pem_s, pem_t = zero3c, zerocc, zc, zc
            if self.pe_bias:
                pb1 = _dense_wb(nn.Dense(c, name="peb_fc1"), 3)
                peb_s, peb_t = _bn_affine(bn(c, name="peb_bn"), c)
                pb2 = _dense_wb(nn.Dense(c, name="peb_fc2"), c)
            else:
                pb1, pb2, peb_s, peb_t = zero3c, zerocc, zc, zc
            we1 = _dense_wb(nn.Dense(g, name="we_fc1"), c)
            we_s, we_t = _bn_affine(bn(g, name="we_bn"), g)
            we2 = _dense_wb(nn.Dense(g, name="we_fc2"), g)

            nmask = ref_mask & mask[..., None]
            out = fused_grouped_vector_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), coord, ref_idx, nmask,
                pb1[0], pb1[1], pb2[0], pb2[1],
                pm1[0], pm1[1], pm2[0], pm2[1],
                we1[0], we1[1], we2[0], we2[1],
                peb_s, peb_t, pem_s, pem_t, we_s, we_t,
                groups=g, pe_mul=self.pe_multiplier, pe_bias=self.pe_bias,
                interpret=(mode == "interpret"),
            ).astype(feat.dtype)
            return jnp.where(mask[..., None], out, 0.0)

        k_g = jax.vmap(
            lambda f, i, co: grouping(f, i, co, co, with_coord=True)
        )(k, ref_idx, coord)                          # (B, N, S, 3+C)
        v_g = jax.vmap(grouping)(v, ref_idx)          # (B, N, S, C)
        pos, k_g = k_g[..., :3], k_g[..., 3:]
        rel = k_g - q[:, :, None, :]
        nmask = ref_mask & mask[..., None]

        if self.pe_multiplier:
            pem = nn.Dense(c, name="pem_fc1")(pos)
            pem = bn(c, name="pem_bn")(pem, nmask, train, context)
            pem = nn.relu(pem)
            pem = nn.Dense(c, name="pem_fc2")(pem)
            rel = rel * pem
        if self.pe_bias:
            peb = nn.Dense(c, name="peb_fc1")(pos)
            peb = bn(c, name="peb_bn")(peb, nmask, train, context)
            peb = nn.relu(peb)
            peb = nn.Dense(c, name="peb_fc2")(peb)
            rel = rel + peb
            v_g = v_g + peb

        w = nn.Dense(g, name="we_fc1")(rel)
        w = bn(g, name="we_bn")(w, nmask, train, context)
        w = nn.relu(w)
        w = nn.Dense(g, name="we_fc2")(w)             # (B, N, S, G)
        w = masked_softmax(w, nmask[..., None], axis=2)

        v_g = v_g.reshape(v_g.shape[:3] + (g, c // g))
        out = jnp.einsum("bnsgi,bnsg->bngi", v_g, w.astype(v_g.dtype))
        out = out.reshape(feat.shape[:2] + (c,))
        return jnp.where(mask[..., None], out, 0.0)


class Block(nn.Module):
    """Residual GVA block (reference :132-178)."""

    embed_channels: int
    groups: int
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    drop_path: float = 0.0
    norm: Optional[object] = None

    @nn.compact
    def __call__(self, feat, coord, ref_idx, ref_mask, mask, train: bool,
                 context=None):
        c = self.embed_channels
        bn = self.norm or MaskedBatchNorm
        identity = feat
        y = nn.Dense(c, use_bias=False, name="fc1")(feat)
        y = bn(c, name="norm1")(y, mask, train, context)
        y = nn.relu(y)
        y = GroupedVectorAttention(
            c, self.groups, self.qkv_bias, self.pe_multiplier, self.pe_bias,
            self.norm, name="attn",
        )(y, coord, ref_idx, ref_mask, mask, train, context)
        y = bn(c, name="norm2")(y, mask, train, context)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc3")(y)
        y = bn(c, name="norm3")(y, mask, train, context)
        if self.drop_path > 0:
            keep = 1.0 - self.drop_path
            if train:
                rng = self.make_rng("dropout")
                dp = jax.random.bernoulli(
                    rng, keep, (feat.shape[0], 1, 1)
                ).astype(y.dtype)
                y = y * dp / keep
        y = nn.relu(identity + y)
        return jnp.where(mask[..., None], y, 0.0)


class BlockSequence(nn.Module):
    """kNN reference index + depth x Block (reference :180-227)."""

    depth: int
    embed_channels: int
    groups: int
    neighbours: int = 16
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    drop_path: float = 0.0
    norm: Optional[object] = None

    @nn.compact
    def __call__(self, feat, coord, mask, train: bool, context=None,
                 nbr=None):
        if nbr is None:
            idx, dist2 = jax.vmap(
                lambda c, m: knn(c, c, self.neighbours, ref_mask=m)
            )(coord, mask)
            ref_mask = jnp.isfinite(dist2)
        else:
            # caller-provided table (ascending by distance, so a wider
            # table sliced to self.neighbours is the k-NN prefix)
            idx, ref_mask = nbr
            assert idx.shape[-1] >= self.neighbours, (
                f"nbr table k={idx.shape[-1]} < neighbours="
                f"{self.neighbours}: slicing would silently shrink the "
                f"attention neighborhood")
            idx = idx[..., : self.neighbours]
            ref_mask = ref_mask[..., : self.neighbours]
        for i in range(self.depth):
            feat = Block(
                self.embed_channels, self.groups, self.qkv_bias,
                self.pe_multiplier, self.pe_bias, self.drop_path,
                self.norm, name=f"block{i}",
            )(feat, coord, idx, ref_mask, mask, train, context)
        return feat


class GridPool(nn.Module):
    """Voxel-partition pooling (reference :229-269): fc+bn+relu then
    per-voxel max, coords mean; returns the child->parent cluster map.

    ``capacity`` statically shrinks the parent buffer (the voxel grids
    merge many children per parent, so carrying the full child capacity
    through every deeper stage wastes ~all the padded compute — the r2
    PT-v3 10x slowdown in this model family).  Overflow drops are
    surfaced via sow("diagnostics", "capacity_dropped_points"); bench.py
    asserts zero."""

    in_channels: int
    out_channels: int
    grid_size: float
    norm: Optional[object] = None
    capacity: Optional[int] = None

    @nn.compact
    def __call__(self, feat, coord, mask, train: bool, context=None):
        b, n = mask.shape
        cap = n if self.capacity is None else min(self.capacity, n)
        bn = self.norm or MaskedBatchNorm
        y = nn.Dense(self.out_channels, use_bias=False, name="fc")(feat)
        y = bn(self.out_channels, name="norm")(y, mask, train, context)
        y = nn.relu(y)

        start = jnp.min(
            jnp.where(mask[..., None], coord, jnp.inf), axis=1, keepdims=True
        )
        grid = jnp.floor((coord - start) / self.grid_size).astype(jnp.int32)
        grid = jnp.maximum(grid, 0)
        _, p_mask, c2p = jax.vmap(
            lambda g, m: unique_parents(g, m, 1, cap)
        )(grid, mask)

        valid = (c2p >= 0)
        self.sow("diagnostics", "capacity_dropped_points",
                 jnp.sum(mask & ~valid))
        idx = jnp.maximum(c2p, 0)
        neg = jnp.float32(-jnp.inf)
        pooled = jax.vmap(
            lambda yy, ii, vv: jnp.full(
                (cap, self.out_channels), neg, jnp.float32
            ).at[ii].max(jnp.where(vv[:, None], yy.astype(jnp.float32), neg))
        )(y, idx, valid)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0).astype(y.dtype)

        w = valid.astype(jnp.float32)
        coord_sum = jax.vmap(
            lambda cc, ii, ww: jnp.zeros((cap, 3), jnp.float32).at[ii].add(
                cc * ww[:, None]
            )
        )(coord, idx, w)
        counts = jax.vmap(
            lambda ii, ww: jnp.zeros((cap,), jnp.float32).at[ii].add(ww)
        )(idx, w)
        p_coord = coord_sum / jnp.maximum(counts[..., None], 1.0)
        return pooled, p_coord, p_mask, c2p


class UnpoolWithSkip(nn.Module):
    """Map-based unpooling + skip projection (reference :272-316)."""

    in_channels: int
    skip_channels: int
    out_channels: int
    norm: Optional[object] = None

    @nn.compact
    def __call__(self, feat, mask, skip_feat, skip_mask, c2p, train: bool,
                 context=None):
        bn = self.norm or MaskedBatchNorm
        y = nn.Dense(self.out_channels, name="proj_fc")(feat)
        y = bn(self.out_channels, name="proj_bn")(y, mask, train, context)
        y = nn.relu(y)
        up = jax.vmap(lambda f, i: f[jnp.maximum(i, 0)])(y, c2p)
        up = jnp.where((c2p >= 0)[..., None], up, 0.0)
        sk = nn.Dense(self.out_channels, name="skip_fc")(skip_feat)
        sk = bn(self.out_channels, name="skip_bn")(
            sk, skip_mask, train, context
        )
        sk = nn.relu(sk)
        out = up + sk
        return jnp.where(skip_mask[..., None], out, 0.0)


@MODELS.register_module("PT-v2m2")
class PointTransformerV2(nn.Module):
    in_channels: int
    num_classes: int
    patch_embed_depth: int = 1
    patch_embed_channels: int = 48
    patch_embed_groups: int = 6
    patch_embed_neighbours: int = 8
    enc_depths: Sequence[int] = (2, 2, 6, 2)
    enc_channels: Sequence[int] = (96, 192, 384, 512)
    enc_groups: Sequence[int] = (12, 24, 48, 64)
    enc_neighbours: Sequence[int] = (16, 16, 16, 16)
    dec_depths: Sequence[int] = (1, 1, 1, 1)
    dec_channels: Sequence[int] = (48, 96, 192, 384)
    dec_groups: Sequence[int] = (6, 12, 24, 48)
    dec_neighbours: Sequence[int] = (16, 16, 16, 16)
    grid_sizes: Sequence[float] = (0.06, 0.12, 0.24, 0.48)
    attn_qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    enable_checkpoint: bool = False
    unpool_backend: str = "map"
    # per-level static capacity shrink (PT-v3/SpUNet-style): factor < 1
    # sizes each pooled stage at factor x the previous stage's capacity.
    # The voxel grid-size ratios merge ~6-9 children/parent on surface
    # scans, so 0.25-0.5 is safe there; default 1.0 = old behavior, and
    # any overflow drop is sow'd (bench asserts zero)
    level_capacity_factor: float = 1.0
    min_level_capacity: int = 128
    # PDNorm knobs (PT-v2m3, reference point_transformer_v2m3_pdnorm.py):
    # non-empty ``conditions`` swaps every BN for per-dataset PDNorm
    conditions: Sequence[str] = ()
    norm_decouple: bool = True
    norm_adaptive: bool = False
    norm_affine: bool = True
    context_channels: int = 256
    zero_init: bool = True

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True,
                 condition: Optional[str] = None):
        coord = input_dict["coord"].astype(jnp.float32)
        feat = input_dict["feat"]
        mask = input_dict["mask"]
        num_stages = len(self.enc_depths)
        if self.conditions:
            from ..sparse_unet.spconv_unet import _bn_factory

            condition = condition or input_dict.get("condition_name")
            norm = _bn_factory(
                tuple(self.conditions), condition, self.norm_decouple,
                self.norm_adaptive, self.norm_affine, self.context_channels,
                self.zero_init,
            )
            ctx = input_dict.get("context")
        else:
            norm, ctx = None, None
        bn = norm or MaskedBatchNorm

        # patch embedding
        y = nn.Dense(self.patch_embed_channels, use_bias=False,
                     name="patch_proj")(feat)
        y = bn(self.patch_embed_channels, name="patch_bn")(
            y, mask, train, ctx
        )
        y = nn.relu(y)

        # one kNN table per resolution level, at the widest k any consumer
        # at that level needs (tables are distance-ascending, so narrower
        # consumers slice a prefix): the encoder blocks and the decoder
        # blocks at the same level otherwise each recompute the identical
        # table — at full resolution that duplicate alone is ~30 ms/batch
        def _nbr_table(c, m, k):
            t_idx, t_d2 = jax.vmap(
                lambda cc, mm: knn(cc, cc, k, ref_mask=mm)
            )(c, m)
            return t_idx, jnp.isfinite(t_d2)

        # NOTE: on the approximate TPU kNN paths (pallas/serial) the
        # prefix of a k0=16 query is not guaranteed identical to a direct
        # k=8 query (candidate set and rescue pass depend on k) — exact
        # and CPU paths are unaffected, and the deviation sits within the
        # documented sub-1% recall tolerance; the PT-v2 bench + fused-GVA
        # parity bound (bench.py bench_ptv2) were re-measured on the TPU
        # path after this table widening (r4: 1.16 Mpts/s, q999 0.0065)
        k0 = max(self.patch_embed_neighbours, self.dec_neighbours[0])
        nbr0 = _nbr_table(coord, mask, k0)
        y = BlockSequence(
            self.patch_embed_depth, self.patch_embed_channels,
            self.patch_embed_groups, self.patch_embed_neighbours,
            self.attn_qkv_bias, self.pe_multiplier, self.pe_bias,
            norm=norm, name="patch_blocks",
        )(y, coord, mask, train, ctx, nbr0)

        total_blocks = sum(self.enc_depths) + sum(self.dec_depths)
        dp_rates = [
            self.drop_path_rate * i / max(total_blocks - 1, 1)
            for i in range(total_blocks)
        ]

        skips = [(y, coord, mask)]
        nbrs = [nbr0]
        pools = []
        in_ch = self.patch_embed_channels
        for s in range(num_stages):
            cur_n = skips[-1][2].shape[1]
            cap = None
            if self.level_capacity_factor < 1.0:
                cap = max(int(cur_n * self.level_capacity_factor),
                          self.min_level_capacity)
            y, p_coord, p_mask, c2p = GridPool(
                in_ch, self.enc_channels[s], self.grid_sizes[s],
                norm=norm, capacity=cap, name=f"enc{s}_pool",
            )(skips[-1][0], skips[-1][1], skips[-1][2], train, ctx)
            dp = dp_rates[sum(self.enc_depths[:s])]
            k_lvl = self.enc_neighbours[s]
            if s + 1 < num_stages:
                k_lvl = max(k_lvl, self.dec_neighbours[s + 1])
            nbr = _nbr_table(p_coord, p_mask, k_lvl)
            y = BlockSequence(
                self.enc_depths[s], self.enc_channels[s], self.enc_groups[s],
                self.enc_neighbours[s], self.attn_qkv_bias,
                self.pe_multiplier, self.pe_bias, dp,
                norm=norm, name=f"enc{s}_blocks",
            )(y, p_coord, p_mask, train, ctx, nbr)
            pools.append(c2p)
            skips.append((y, p_coord, p_mask))
            nbrs.append(nbr)
            in_ch = self.enc_channels[s]

        y, cur_coord, cur_mask = skips.pop()
        nbrs.pop()  # the deepest level's table has no decoder consumer
        for s in reversed(range(num_stages)):
            skip_feat, skip_coord, skip_mask = skips.pop()
            y = UnpoolWithSkip(
                y.shape[-1], skip_feat.shape[-1], self.dec_channels[s],
                norm=norm, name=f"dec{s}_unpool",
            )(y, cur_mask, skip_feat, skip_mask, pools[s], train, ctx)
            dp = dp_rates[sum(self.enc_depths) + sum(self.dec_depths[:s])]
            y = BlockSequence(
                self.dec_depths[s], self.dec_channels[s], self.dec_groups[s],
                self.dec_neighbours[s], self.attn_qkv_bias,
                self.pe_multiplier, self.pe_bias, dp,
                norm=norm, name=f"dec{s}_blocks",
            )(y, skip_coord, skip_mask, train, ctx, nbrs.pop())
            cur_coord, cur_mask = skip_coord, skip_mask

        if self.num_classes > 0:
            h = nn.Dense(self.dec_channels[0], name="seg_fc1")(y)
            h = bn(self.dec_channels[0], name="seg_bn")(
                h, cur_mask, train, ctx
            )
            h = nn.relu(h)
            logits = nn.Dense(self.num_classes, name="seg_fc2")(h)
            return jnp.where(cur_mask[..., None], logits, 0.0)
        return jnp.where(cur_mask[..., None], y, 0.0)


@MODELS.register_module("PT-v2m1")
def point_transformer_v2m1(**kwargs):
    """v2m1 registered for config parity: same architecture family with
    pe_multiplier enabled by default (reference point_transformer_v2m1)."""
    kwargs.setdefault("pe_multiplier", True)
    return PointTransformerV2(**kwargs)


@MODELS.register_module("PT-v2m3")
def point_transformer_v2m3(**kwargs):
    """PDNorm PT-v2 (reference point_transformer_v2m3_pdnorm.py): every
    BatchNorm becomes a per-dataset decoupled PDMaskedBatchNorm driven by
    the static dataset ``condition`` (and optionally the PPT context)."""
    kwargs.setdefault("conditions", ("ScanNet", "S3DIS", "Structured3D"))
    return PointTransformerV2(**kwargs)
