"""Point Transformer V3: serialized patch attention, TPU-native.

Re-design of the reference PT-v3
(pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:
51-717).  PTv3's design — sort points along a space-filling curve, chop
into fixed-size patches, run dense attention per patch — is already the
TPU-shaped formulation; this implementation keeps it fully static:

- serialization orders (z / z-trans / hilbert / hilbert-trans) come from
  :mod:`...ops.serialization`; blocks cycle through the orders;
- each sample's points sort valid-first by curve code; the padded (B, N)
  buffer reshapes to (B, N/K, K) patches and attention is masked dense
  multi-head over K keys (the flash-attn varlen path is unnecessary:
  XLA fuses the per-patch softmax-matmul chain);
- xCPE (spconv SubMConv3d in the reference) is the voxel-hash
  gather-GEMM conv from ops/voxel, one shared neighbor table per stage;
- grid pooling = ``unique_parents`` on grid//2 with segment max/mean,
  unpooling reads the child→parent map backwards.

``enable_rpe`` adds the reference's learned grid-offset bias tables to
each patch's attention logits (reference RPE :29-49 — the S3DIS flagship
config is the -rpe variant); flash-specific switches are accepted but
moot (the masked dense patch attention is already the fused TPU path);
drop_path is stochastic depth per sample.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.serialization import serialize_code
from ...ops.voxel import (
    flatten_neighbor_rows,
    flatten_slot_map,
    kernel_offsets,
    neighbor_table,
    neighbor_table_dense,
    raster_sort,
    unique_parents,
    unique_parents_sorted,
)
from ..builder import MODELS
from ..norm import MaskedBatchNorm, PDLayerNorm
from ..sparse_unet.spconv_unet import SubMConv, WindowSubMConv, _bn_factory

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class _PlainLN(nn.Module):
    """LayerNorm with the (x, mask, train, context) norm call convention
    shared with the PDNorm factories (mask/train/context ignored)."""

    @nn.compact
    def __call__(self, x, mask=None, train=True, context=None):
        return nn.LayerNorm(name="ln")(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a flat (B*N, C) tensor."""

    rate: float
    batch: int

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (self.batch, 1, 1))
        y = x.reshape(self.batch, -1, x.shape[-1]) * mask / keep
        return y.reshape(x.shape).astype(x.dtype)


def _sort_orders(grid, mask, orders):
    """Per-sample, per-order sort permutations (valid first).

    Returns (num_orders, B, N) int32 ``order`` (positions into the
    unsorted array) and ``inverse`` (where each unsorted point landed).
    """
    perms, invs = [], []
    n = grid.shape[1]
    for name in orders:
        code = serialize_code(grid, name)
        code = jnp.where(mask, code, jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(code, axis=-1).astype(jnp.int32)       # (B, N)
        inv = jnp.zeros_like(perm)
        inv = jax.vmap(
            lambda p: jnp.zeros((n,), jnp.int32).at[p].set(
                jnp.arange(n, dtype=jnp.int32)
            )
        )(perm)
        perms.append(perm)
        invs.append(inv)
    return jnp.stack(perms), jnp.stack(invs)


class RPE(nn.Module):
    """Relative-position bias over integer grid offsets.

    Re-expression of the reference RPE table
    (point_transformer_v3m1_base.py:29-49): a learned (3*rpe_num, H)
    table indexed by the per-axis clamped grid delta; the three axis
    biases sum into one (…, H) bias per key pair.
    """

    patch_size: int
    num_heads: int

    @nn.compact
    def __call__(self, rel: jnp.ndarray) -> jnp.ndarray:
        pos_bnd = int((4 * self.patch_size) ** (1 / 3) * 2)
        rpe_num = 2 * pos_bnd + 1
        table = self.param(
            "rpe_table", _trunc02, (3 * rpe_num, self.num_heads)
        )
        idx = (
            jnp.clip(rel, -pos_bnd, pos_bnd)
            + pos_bnd
            + jnp.arange(3, dtype=rel.dtype) * rpe_num
        )                                             # (B, P, K, K, 3)
        bias = jnp.take(table, idx, axis=0).sum(-2)   # (B, P, K, K, H)
        return jnp.moveaxis(bias, -1, 2)              # (B, P, H, K, K)


class SerializedAttention(nn.Module):
    """Masked dense MHA over curve-order patches (reference :51-223)."""

    channels: int
    num_heads: int
    patch_size: int
    qkv_bias: bool = True
    enable_rpe: bool = False

    @nn.compact
    def __call__(self, feat, order, inverse, mask, train: bool, grid=None):
        b, n = mask.shape
        k = self.patch_size
        h = self.num_heads
        hd = self.channels // h
        n_pad = -(-n // k) * k

        qkv = nn.Dense(self.channels * 3, use_bias=self.qkv_bias,
                       kernel_init=_trunc02, name="qkv")(feat)
        qkv = qkv.reshape(b, n, 3 * self.channels)
        qkv_s = jnp.take_along_axis(qkv, order[..., None], axis=1)
        mask_s = jnp.take_along_axis(mask, order, axis=1)
        if self.enable_rpe:
            grid_s = jnp.take_along_axis(grid, order[..., None], axis=1)
        if n_pad != n:
            qkv_s = jnp.pad(qkv_s, ((0, 0), (0, n_pad - n), (0, 0)))
            mask_s = jnp.pad(mask_s, ((0, 0), (0, n_pad - n)))
            if self.enable_rpe:
                grid_s = jnp.pad(grid_s, ((0, 0), (0, n_pad - n), (0, 0)))
        p = n_pad // k
        qkv_s = qkv_s.reshape(b, p, k, 3, h, hd)
        q, kk, v = jnp.moveaxis(qkv_s, 3, 0)          # (B, P, K, H, hd)
        patch_mask = mask_s.reshape(b, p, k)

        scale = hd ** -0.5
        logits = jnp.einsum(
            "bpkhd,bpmhd->bphkm", q.astype(jnp.float32) * scale,
            kk.astype(jnp.float32),
        )
        if self.enable_rpe:
            g = grid_s.reshape(b, p, k, 3)
            rel = g[:, :, :, None, :] - g[:, :, None, :, :]
            logits = logits + RPE(
                self.patch_size, self.num_heads, name="rpe"
            )(rel).astype(logits.dtype)
        neg = jnp.float32(-1e9)
        logits = jnp.where(patch_mask[:, :, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        # fully-masked rows produce uniform attn over masked keys; their
        # outputs are zeroed below via the point mask
        out = jnp.einsum("bphkm,bpmhd->bpkhd", attn.astype(v.dtype), v)
        out = out.reshape(b, n_pad, self.channels)[:, :n]
        out = jnp.take_along_axis(out, inverse[..., None], axis=1)
        out = nn.Dense(self.channels, kernel_init=_trunc02, name="proj")(out)
        return jnp.where(mask[..., None], out, 0.0)


class Block(nn.Module):
    """xCPE + serialized attention + MLP, pre-norm residuals
    (reference Block :251-339)."""

    channels: int
    num_heads: int
    patch_size: int
    mlp_ratio: float
    drop_path: float
    qkv_bias: bool = True
    enable_rpe: bool = False
    ln: Optional[object] = None
    # window-conv mode (dense_extent path): host numpy kernel offsets +
    # window width; engaged when nbr is None.  conv_extent (set on one
    # block per stage) additionally sows the exact coverage diagnostic.
    conv_offsets: Optional[object] = None
    conv_window: int = 1024
    conv_extent: Optional[object] = None

    @nn.compact
    def __call__(self, feat, nbr, order, inverse, mask, train: bool,
                 grid=None, context=None):
        b, n = mask.shape
        ln = self.ln or (lambda c, name: _PlainLN(name=name))
        flat_mask = mask.reshape(b * n)
        flat = feat.reshape(b * n, -1)

        # xCPE: SubMConv3d + Linear + LayerNorm, residual
        if nbr is None:
            # gather-free sorted-window implicit GEMM (rows are raster
            # ranks on the dense_extent path)
            y3, ms = WindowSubMConv(
                self.channels, self.channels, self.conv_offsets,
                use_bias=True, window=self.conv_window,
                name="cpe_conv")(feat, grid, mask)
            if self.conv_extent is not None:
                from ...ops.window_conv import window_match_counts

                missed = jnp.sum(jax.vmap(
                    lambda s_, g_, m_: window_match_counts(
                        s_, g_, m_, self.conv_offsets,
                        tuple(self.conv_extent))
                )(ms, grid, mask))
                self.sow("diagnostics", "conv_window_missed", missed)
            y = y3.reshape(b * n, -1)
        else:
            y = SubMConv(self.channels, self.channels, nbr.shape[-1],
                         use_bias=True, name="cpe_conv")(flat, nbr)
        y = nn.Dense(self.channels, kernel_init=_trunc02, name="cpe_fc")(y)
        y = ln(self.channels, name="cpe_norm")(y, flat_mask, train, context)
        flat = flat + jnp.where(flat_mask[:, None], y, 0.0)
        feat = flat.reshape(b, n, -1)

        dp = DropPath(self.drop_path, b, name="drop_path")

        shortcut = feat
        y = ln(self.channels, name="norm1")(feat, mask, train, context)
        y = SerializedAttention(
            self.channels, self.num_heads, self.patch_size,
            self.qkv_bias, self.enable_rpe, name="attn",
        )(y, order, inverse, mask, train, grid=grid)
        feat = shortcut + dp(
            y.reshape(b * n, -1), train
        ).reshape(b, n, -1)

        shortcut = feat
        y = ln(self.channels, name="norm2")(feat, mask, train, context)
        y = nn.Dense(int(self.channels * self.mlp_ratio),
                     kernel_init=_trunc02, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.channels, kernel_init=_trunc02, name="mlp_fc2")(y)
        feat = shortcut + dp(y.reshape(b * n, -1), train).reshape(b, n, -1)
        return jnp.where(mask[..., None], feat, 0.0)


@MODELS.register_module("PT-v3m1")
class PointTransformerV3(nn.Module):
    in_channels: int = 6
    order: Sequence[str] = ("z", "z-trans", "hilbert", "hilbert-trans")
    stride: Sequence[int] = (2, 2, 2, 2)
    enc_depths: Sequence[int] = (2, 2, 2, 6, 2)
    enc_channels: Sequence[int] = (32, 64, 128, 256, 512)
    enc_num_head: Sequence[int] = (2, 4, 8, 16, 32)
    enc_patch_size: Sequence[int] = (48, 48, 48, 48, 48)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    dec_channels: Sequence[int] = (64, 64, 128, 256)
    dec_num_head: Sequence[int] = (4, 4, 8, 16)
    dec_patch_size: Sequence[int] = (48, 48, 48, 48)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.3
    shuffle_orders: bool = True
    cls_mode: bool = False
    enable_rpe: bool = False
    # flash/upcast switches accepted for config parity; the masked dense
    # patch attention is already the fused TPU path
    enable_flash: bool = True
    upcast_attention: bool = True
    upcast_softmax: bool = True
    qk_scale: float = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pre_norm: bool = True
    pdnorm_bn: bool = False
    pdnorm_ln: bool = False
    pdnorm_decouple: bool = True
    pdnorm_adaptive: bool = False
    pdnorm_affine: bool = True
    pdnorm_conditions: Sequence[str] = ()
    # per-level static capacity: factor < 1 shrinks each stage's padded
    # buffer after stride-2 grid pooling.  Dense indoor surface scans
    # merge >=2 voxels per parent, so 0.5 is safe there and removes the
    # dominant waste (stage-5's 512-ch attention+MLP otherwise runs on a
    # buffer 16x its valid points).  Default 1.0 never drops — sparse
    # outdoor LiDAR can keep >N/2 unique parents; any capacity overflow
    # is surfaced via sow("diagnostics", "capacity_dropped_points").
    level_capacity_factor: float = 1.0
    min_level_capacity: int = 128
    # static per-sample grid extent (X, Y, Z).  When set, the backbone
    # raster-sorts each sample once and every level switches to the
    # dense-occupancy rulebook (ops/voxel.neighbor_table_dense: one
    # 4-int32 slice gather per (dx, dy) probe group) and the sort-free
    # unique_parents_sorted — together removing the per-level hash
    # builds and sorts that dominated the forward
    # (tools/profile_ptv3.py, tools/microbench_voxel.py).  None keeps
    # the extent-free hash path.
    dense_extent: Optional[Sequence[int]] = None
    # sorted-window implicit-GEMM conv (dense path): rank-window width
    # for the xCPE/stem taps; conv_coverage_check sows the exact
    # missed-neighbor count per stage ("conv_window_missed" — bench and
    # tests assert 0; production leaves it off)
    conv_window: int = 1024
    conv_coverage_check: bool = False

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True,
                 condition: Optional[str] = None):
        num_stages = len(self.enc_depths)
        orders = list(self.order)
        conds = tuple(self.pdnorm_conditions)
        if conds and (self.pdnorm_bn or self.pdnorm_ln):
            condition = condition or input_dict.get("condition_name")
            ctx = input_dict.get("context")
        else:
            ctx = None
        if conds and self.pdnorm_bn:
            bn = _bn_factory(
                conds, condition, self.pdnorm_decouple,
                self.pdnorm_adaptive, self.pdnorm_affine,
            )
        else:
            bn = functools.partial(MaskedBatchNorm, momentum=0.01,
                                   epsilon=1e-3)
        if conds and self.pdnorm_ln:
            ln = functools.partial(
                PDLayerNorm, conditions=conds, condition=condition,
                decouple=self.pdnorm_decouple,
                adaptive=self.pdnorm_adaptive, affine=self.pdnorm_affine,
            )
        else:
            ln = None
        off3 = kernel_offsets(3)
        off5 = kernel_offsets(5)

        grid = input_dict["grid_coord"].astype(jnp.int32)
        feat = input_dict["feat"]
        mask = input_dict["mask"]
        b, n = mask.shape

        inv_perm = None
        if self.dense_extent is not None:
            # raster-sort once: rows become raster ranks, enabling the
            # dense-occupancy rulebook + sort-free pooling at every level
            ext0 = tuple(int(x) for x in self.dense_extent)
            perm, inv_perm, sorted_mask = jax.vmap(
                lambda g, m: raster_sort(g, m, ext0))(grid, mask)
            grid = jnp.take_along_axis(grid, perm[..., None], axis=1)
            feat = jnp.take_along_axis(feat, perm[..., None], axis=1)
            # points outside the configured extent are dropped (visibly)
            self.sow("diagnostics", "dense_extent_dropped_points",
                     jnp.sum(mask) - jnp.sum(sorted_mask))
            mask = sorted_mask

        def level_extent(s):
            e = tuple(int(x) for x in self.dense_extent)
            return tuple(-(-x // (2 ** s)) for x in e)

        def make_nbr(g, m, offsets, s):
            if self.dense_extent is None:
                return jax.vmap(
                    lambda gg, mm: neighbor_table(gg, mm, offsets))(g, m)
            ext = level_extent(s)
            return jax.vmap(
                lambda gg, mm: neighbor_table_dense(gg, mm, offsets, ext)
            )(g, m)

        pool_fn = (unique_parents_sorted if self.dense_extent is not None
                   else unique_parents)

        # stem embedding: SubMConv k5 + BN + relu (reference Embedding)
        flat_mask = mask.reshape(b * n)
        if self.dense_extent is None:
            nbr5 = flatten_neighbor_rows(make_nbr(grid, mask, off5, 0))
            y = SubMConv(self.in_channels, self.enc_channels[0],
                         off5.shape[0], name="embedding")(
                             feat.reshape(b * n, -1), nbr5)
        else:
            y3, ms5 = WindowSubMConv(
                self.in_channels, self.enc_channels[0], off5,
                window=self.conv_window, name="embedding")(feat, grid, mask)
            if self.conv_coverage_check:
                from ...ops.window_conv import window_match_counts

                missed5 = jnp.sum(jax.vmap(
                    lambda s_, g_, m_: window_match_counts(
                        s_, g_, m_, off5, level_extent(0))
                )(ms5, grid, mask))
                self.sow("diagnostics", "conv_window_missed", missed5)
            y = y3.reshape(b * n, -1)
        y = bn(self.enc_channels[0], name="embedding_bn")(
            y, flat_mask, train, ctx
        )
        y = nn.relu(y)
        feat = jnp.where(flat_mask[:, None], y, 0.0).reshape(b, n, -1)

        # per-stage drop-path schedule
        total = sum(self.enc_depths)
        enc_dp = [self.drop_path * i / max(total - 1, 1) for i in range(total)]

        skips = []       # (feat, grid, mask) per stage
        pools = []       # (c2p (B,N), parent level arrays)
        level = dict(grid=grid, mask=mask)
        for s in range(num_stages):
            if s > 0:
                # serialized (grid) pooling, stride 2, into a (possibly
                # shrunk) static parent capacity
                child_n = level["grid"].shape[1]
                cap = child_n
                if self.level_capacity_factor < 1.0:
                    cap = max(self.min_level_capacity,
                              int(child_n * self.level_capacity_factor))
                    cap = min(-(-cap // 8) * 8, child_n)  # sublane align
                p_grid, p_mask, c2p = jax.vmap(
                    lambda g, m: pool_fn(g, m, 2, capacity=cap)
                )(level["grid"], level["mask"])
                proj = nn.Dense(self.enc_channels[s], kernel_init=_trunc02,
                                name=f"pool{s}_proj")(feat)
                flat_c2p = flatten_slot_map(c2p, slot_count=cap)
                flat_proj = proj.reshape(b * child_n, -1)
                valid = (flat_c2p >= 0)[:, None]
                if cap < child_n:
                    # children of capacity-overflow parents map to -1;
                    # surface any drop instead of silently losing voxels
                    child_valid = level["mask"].reshape(b * child_n)
                    self.sow("diagnostics", "capacity_dropped_points",
                             jnp.sum(child_valid & ~valid[:, 0]))
                pooled = jnp.full(
                    (b * cap, self.enc_channels[s]), -jnp.inf, jnp.float32
                ).at[jnp.maximum(flat_c2p, 0)].max(
                    jnp.where(valid, flat_proj.astype(jnp.float32), -jnp.inf)
                )
                pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
                flat_p_mask = p_mask.reshape(b * cap)
                pooled = bn(self.enc_channels[s], name=f"pool{s}_bn")(
                    pooled.astype(feat.dtype), flat_p_mask, train, ctx
                )
                pooled = nn.relu(pooled)
                pools.append(dict(c2p=c2p, child=dict(level)))
                level = dict(grid=p_grid, mask=p_mask)
                feat = jnp.where(
                    flat_p_mask[:, None], pooled, 0.0
                ).reshape(b, cap, -1)

            g, m = level["grid"], level["mask"]
            dense = self.dense_extent is not None
            stage_nbr = (None if dense else
                         flatten_neighbor_rows(make_nbr(g, m, off3, s)))
            perms, invs = _sort_orders(g, m, orders)
            base = sum(self.enc_depths[:s])
            for i in range(self.enc_depths[s]):
                oi = i % len(orders)
                feat = Block(
                    self.enc_channels[s], self.enc_num_head[s],
                    self.enc_patch_size[s], self.mlp_ratio,
                    enc_dp[base + i], self.qkv_bias, self.enable_rpe,
                    ln, conv_offsets=off3 if dense else None,
                    conv_window=self.conv_window,
                    conv_extent=(level_extent(s)
                                 if dense and self.conv_coverage_check
                                 and i == 0 else None),
                    name=f"enc{s}_block{i}",
                )(feat, stage_nbr, perms[oi], invs[oi], m, train, grid=g,
                  context=ctx)
            # the decoder revisits the same levels: reuse the neighbor
            # table and sort orders instead of rebuilding (the hash
            # build+probe dominates the whole forward — see
            # tools/profile_ptv3.py)
            skips.append((feat, dict(level), stage_nbr, perms, invs))

        if not self.cls_mode:
            dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
            total_d = sum(self.dec_depths)
            dec_dp = [
                self.drop_path * i / max(total_d - 1, 1) for i in range(total_d)
            ]
            feat, level = skips[-1][:2]
            for s in reversed(range(num_stages - 1)):
                skip_feat, skip_level, skip_nbr, perms, invs = skips[s]
                c2p = pools[s]["c2p"]
                parent_n = level["grid"].shape[1]
                child_n = skip_level["grid"].shape[1]
                # unpooling: proj both sides, parent feat broadcast to children
                y = nn.Dense(dec_channels[s], kernel_init=_trunc02,
                             name=f"unpool{s}_proj")(feat)
                y = bn(dec_channels[s], name=f"unpool{s}_bn")(
                    y.reshape(b * parent_n, -1),
                    level["mask"].reshape(b * parent_n), train, ctx
                )
                y = nn.relu(y)
                sk = nn.Dense(dec_channels[s], kernel_init=_trunc02,
                              name=f"unpool{s}_skip")(skip_feat)
                sk = bn(dec_channels[s], name=f"unpool{s}_skip_bn")(
                    sk.reshape(b * child_n, -1),
                    skip_level["mask"].reshape(b * child_n), train, ctx,
                )
                sk = nn.relu(sk).reshape(b, child_n, -1)
                flat_c2p = flatten_slot_map(c2p, slot_count=parent_n)
                up = y.reshape(b * parent_n, -1)[jnp.maximum(flat_c2p, 0)]
                up = jnp.where((flat_c2p >= 0)[:, None], up, 0.0)
                feat = sk + up.reshape(b, child_n, -1)
                level = skip_level
                g, m = level["grid"], level["mask"]
                stage_nbr = skip_nbr
                base = sum(self.dec_depths[:s])
                for i in range(self.dec_depths[s]):
                    oi = i % len(orders)
                    feat = Block(
                        dec_channels[s], self.dec_num_head[s],
                        self.dec_patch_size[s], self.mlp_ratio,
                        dec_dp[base + i], self.qkv_bias, self.enable_rpe,
                        ln,
                        conv_offsets=(off3 if stage_nbr is None else None),
                        conv_window=self.conv_window,
                        name=f"dec{s}_block{i}",
                    )(feat, stage_nbr, perms[oi], invs[oi], m, train, grid=g,
                      context=ctx)
            out = jnp.where(level["mask"][..., None], feat, 0.0)
            if inv_perm is not None:
                out = jnp.take_along_axis(out, inv_perm[..., None], axis=1)
            return out

        # cls mode: features at the coarsest level; caller pools
        from ..utils.structure import masked_mean

        return masked_mean(feat, level["mask"], axis=1)
