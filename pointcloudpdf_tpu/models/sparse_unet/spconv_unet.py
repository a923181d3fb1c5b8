"""SpUNet: sparse voxel-conv U-Net as gather/GEMM/scatter over hash maps.

TPU-native re-expression of the reference SpUNet-v1m1
(pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:88-281, built on
spconv).  Instead of spconv's rulebook CUDA kernels:

- a level's voxel set is a fixed-capacity padded list (grid, mask) per
  sample; submanifold 3³/5³ convs read a per-level ``neighbor_table``
  (sorted-hash binary search, ops/voxel.py) and accumulate K gather-GEMMs
  on the MXU;
- the 2× strided conv scatters children onto ``unique_parents`` slots with
  per-kernel-position weights (each child belongs to exactly one of the
  2³ positions — same semantics as spconv.SparseConv3d(k=2, s=2));
- the inverse conv reads the saved child→parent map backwards
  (spconv.SparseInverseConv3d sharing the down conv's indice_key).

Batch handling: per-sample index maps are built under vmap, then
everything flattens to (B·N, C) so the GEMMs see one tall matrix.
Per-level capacities are static but optionally SHRINK after each strided
conv (``level_capacity_factor`` < 1, drop-asserted via the diagnostics
sow — the indoor configs ship 0.5); masked BN runs over valid voxels,
and ``cls_mode`` ends in a masked per-sample mean pool (reference
:276-280).  The dense-extent fast path runs the sorted-window
implicit-GEMM convs (ops/window_conv.py) instead of the hash rulebook.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxel import (
    flatten_neighbor_rows as _flatten_nbr,
    flatten_slot_map as _flatten_map,
    gather_conv,
    kernel_offsets,
    neighbor_table,
    neighbor_table_dense,
    raster_sort,
    unique_parents,
    unique_parents_sorted,
)
from ..builder import MODELS
from ..norm import MaskedBatchNorm, PDMaskedBatchNorm
from ..utils.structure import masked_mean

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _bn_factory(conditions=(), condition=None, decouple=True, adaptive=False,
                affine=True, context_channels=256, zero_init=True):
    """Norm constructor: plain masked BN, or per-condition PDNorm when
    ``conditions`` is non-empty (the SpUNet-v1m3 swap,
    reference spconv_unet_v1m3_pdnorm.py:231-268)."""
    if conditions:
        return functools.partial(
            PDMaskedBatchNorm, conditions=tuple(conditions),
            condition=condition, decouple=decouple, adaptive=adaptive,
            affine=affine, context_channels=context_channels,
            zero_init=zero_init, momentum=0.01, epsilon=1e-3,
        )
    return functools.partial(MaskedBatchNorm, momentum=0.01, epsilon=1e-3)


class SubMConv(nn.Module):
    """Submanifold conv over a precomputed neighbor table."""

    in_channels: int
    out_channels: int
    num_offsets: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel", _trunc02,
            (self.num_offsets, self.in_channels, self.out_channels),
        )
        y = gather_conv(feat, nbr, w)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
        return y


def _make_conv(nbr, wctx):
    """Uniform conv applicator for the blocks: gather-based SubMConv when
    a neighbor table is given, sorted-window implicit GEMM otherwise
    (wctx = dict(grid, mask, offsets, window) at the block's level)."""
    if nbr is not None:
        def apply(cls, c_in, c_out, name):
            def run(feat):
                return cls(c_in, c_out, nbr.shape[-1], name=name)(feat, nbr)
            return run
        return apply

    b, nl = wctx["mask"].shape

    def apply(cls, c_in, c_out, name):
        def run(feat):
            y3, _ = cls(c_in, c_out, wctx["offsets"],
                        window=wctx["window"], name=name)(
                            feat.reshape(b, nl, c_in),
                            wctx["grid"], wctx["mask"])
            return y3.reshape(b * nl, c_out)
        return run
    return apply


class WindowSubMConv(nn.Module):
    """Submanifold conv via the sorted-window implicit GEMM.

    Parameter-compatible with :class:`SubMConv` (same "kernel"/"bias"
    shapes for the same offset count), but gather-free: rows must be
    raster-sorted (ops/voxel.raster_sort) and the kernel taps resolve as
    0/1 match matrices contracted on the MXU
    (ops/window_conv.window_submconv).  Returns (out, match_sum) — the
    caller sows the coverage diagnostic via
    ops/window_conv.window_match_counts.
    """

    in_channels: int
    out_channels: int
    offsets: object        # host numpy (K, 3) kernel offsets
    use_bias: bool = False
    tile: int = 256
    window: int = 1024

    @nn.compact
    def __call__(self, feat, grid, mask):
        from ...ops.window_conv import window_submconv

        k = int(self.offsets.shape[0])
        w = self.param(
            "kernel", _trunc02, (k, self.in_channels, self.out_channels))
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)
        n_pad = -(-feat.shape[1] // self.tile) * self.tile
        win = min(self.window, 2 * n_pad)
        out, ms = jax.vmap(
            lambda f, g, m: window_submconv(
                f, g, m, self.offsets, w, b, tile=self.tile, window=win)
        )(feat, grid, mask)
        return out, ms  # (B,) per-sample realized match counts


class SparseDownConv(nn.Module):
    """2x strided conv: children scatter onto parent voxels.

    Child at grid g contributes feat @ W[pos(g % 2)] to parent g // 2.
    """

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, feat, c2p_flat, pos, valid, num_parents):
        w = self.param(
            "kernel", _trunc02, (8, self.in_channels, self.out_channels)
        )
        out = jnp.zeros((num_parents, self.out_channels), jnp.float32)
        idx = jnp.maximum(c2p_flat, 0)
        for k in range(8):
            m = (pos == k) & valid
            contrib = jnp.dot(
                feat * m[:, None].astype(feat.dtype),
                w[k].astype(feat.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out.at[idx].add(
                jnp.where(m[:, None], contrib, 0.0)
            )
        return out.astype(feat.dtype)


class SparseInverseConv(nn.Module):
    """2x upsample: each child reads its parent with positional weights."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, parent_feat, c2p_flat, pos, valid):
        w = self.param(
            "kernel", _trunc02, (8, self.in_channels, self.out_channels)
        )
        gathered = parent_feat[jnp.maximum(c2p_flat, 0)]
        gathered = jnp.where(valid[:, None], gathered, 0.0)
        out = jnp.zeros((gathered.shape[0], self.out_channels), jnp.float32)
        for k in range(8):
            m = ((pos == k) & valid)[:, None]
            out = out + jnp.where(
                m,
                jnp.dot(gathered, w[k].astype(gathered.dtype),
                        preferred_element_type=jnp.float32),
                0.0,
            )
        return out.astype(parent_feat.dtype)


class BasicBlock(nn.Module):
    """Residual submanifold block (reference BasicBlock :23-86)."""

    in_channels: int
    embed_channels: int
    norm: Any = None

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool, context=None,
                 wctx=None):
        bn = self.norm or _bn_factory()
        identity = feat
        if self.in_channels != self.embed_channels:
            identity = nn.Dense(
                self.embed_channels, use_bias=False,
                kernel_init=_trunc02, name="proj",
            )(feat)
            identity = bn(self.embed_channels, name="proj_bn")(
                identity, mask, train, context
            )
        conv = _make_conv(nbr, wctx)
        y = conv(SubMConv if nbr is not None else WindowSubMConv,
                 self.in_channels, self.embed_channels, "conv1")(feat)
        y = bn(self.embed_channels, name="bn1")(y, mask, train, context)
        y = nn.relu(y)
        y = conv(SubMConv if nbr is not None else WindowSubMConv,
                 self.embed_channels, self.embed_channels, "conv2")(y)
        y = bn(self.embed_channels, name="bn2")(y, mask, train, context)
        y = nn.relu(y + identity)
        return jnp.where(mask[:, None], y, 0.0)


class BottleneckBlock(nn.Module):
    """1-3-1 residual bottleneck (MinkowskiNet Bottleneck, expansion 4;
    reference mink_unet.py Bottleneck — used by MinkUNet50/101)."""

    in_channels: int
    embed_channels: int
    expansion: int = 4
    norm: Any = None

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool, context=None,
                 wctx=None):
        bn = self.norm or _bn_factory()
        out_channels = self.embed_channels * self.expansion
        identity = feat
        if self.in_channels != out_channels:
            identity = nn.Dense(
                out_channels, use_bias=False,
                kernel_init=_trunc02, name="proj",
            )(feat)
            identity = bn(out_channels, name="proj_bn")(
                identity, mask, train, context
            )
        y = nn.Dense(self.embed_channels, use_bias=False,
                     kernel_init=_trunc02, name="conv1")(feat)
        y = bn(self.embed_channels, name="bn1")(y, mask, train, context)
        y = nn.relu(y)
        conv = _make_conv(nbr, wctx)
        y = conv(SubMConv if nbr is not None else WindowSubMConv,
                 self.embed_channels, self.embed_channels, "conv2")(y)
        y = bn(self.embed_channels, name="bn2")(y, mask, train, context)
        y = nn.relu(y)
        y = nn.Dense(out_channels, use_bias=False,
                     kernel_init=_trunc02, name="conv3")(y)
        y = bn(out_channels, name="bn3")(y, mask, train, context)
        y = nn.relu(y + identity)
        return jnp.where(mask[:, None], y, 0.0)


@MODELS.register_module("SpUNet-v1m1")
class SpUNet(nn.Module):
    in_channels: int
    num_classes: int
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    cls_mode: bool = False
    block: str = "basic"          # "basic" | "bottleneck" (MinkUNet50/101)
    # PDNorm knobs (SpUNet-v1m3, reference spconv_unet_v1m3_pdnorm.py):
    # non-empty ``conditions`` swaps every BN for a per-dataset decoupled
    # PDMaskedBatchNorm; ``condition`` arrives as a static call argument
    conditions: Sequence[str] = ()
    norm_decouple: bool = True
    norm_adaptive: bool = False
    norm_affine: bool = True
    context_channels: int = 256
    zero_init: bool = True
    # per-level voxel capacity: factor < 1 shrinks the static buffer at
    # each 2x stride (dense indoor surface scans merge >=2 voxels per
    # parent, so 0.5 is safe there and ~1.4x faster — set it in those
    # configs).  The default 1.0 never drops: sparse outdoor LiDAR
    # (nuScenes/SemanticKITTI) can keep >N/2 unique parents, where a
    # shrunk capacity would silently map overflow children to -1.  Any
    # drop is surfaced via sow("diagnostics", "capacity_dropped_points")
    # and tested in tests/test_sparse_unet.py.
    level_capacity_factor: float = 1.0
    min_level_capacity: int = 128
    # static per-sample grid extent (X, Y, Z).  When set, samples are
    # raster-sorted once and every level switches to the dense-occupancy
    # rulebook (ops/voxel.neighbor_table_dense) + the sort-free
    # unique_parents_sorted — removing the per-level hash builds and
    # sorts that dominate the forward (tools/microbench_voxel.py).
    # None keeps the extent-free hash path (outdoor LiDAR extents are
    # too large to allocate densely).
    dense_extent: Optional[Sequence[int]] = None
    # sorted-window implicit-GEMM conv (dense path): rank-window width;
    # conv_coverage_check sows the exact per-level missed-neighbor count
    # ("conv_window_missed") for bench/tests to assert 0
    conv_window: int = 1024
    conv_coverage_check: bool = False

    @nn.compact
    def __call__(self, input_dict: Dict, train: bool = True,
                 condition: Optional[str] = None):
        assert len(self.layers) % 2 == 0
        num_stages = len(self.layers) // 2
        if self.conditions:
            condition = condition or input_dict.get("condition_name")
        bn = _bn_factory(
            tuple(self.conditions), condition, self.norm_decouple,
            self.norm_adaptive, self.norm_affine, self.context_channels,
            self.zero_init,
        )
        ctx = input_dict.get("context") if self.conditions else None
        block_cls = (
            BottleneckBlock if self.block == "bottleneck" else BasicBlock
        )

        grid = input_dict["grid_coord"].astype(jnp.int32)   # (B, N, 3)
        feat = input_dict["feat"]                           # (B, N, C)
        mask = input_dict["mask"]                           # (B, N)
        b, n = mask.shape

        inv_perm = None
        if self.dense_extent is not None:
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

        off5 = kernel_offsets(5)
        off3 = kernel_offsets(3)
        dense = self.dense_extent is not None
        flat_feat = feat.reshape(b * n, -1)
        flat_mask = mask.reshape(b * n)

        def make_wctx(g, m, s):
            w = dict(grid=g, mask=m, offsets=off3, window=self.conv_window)
            if self.conv_coverage_check:
                from ...ops.window_conv import (window_match_counts,
                                                window_match_sum)

                ms = jax.vmap(lambda gg, mm: window_match_sum(
                    gg, mm, off3, window=self.conv_window))(g, m)
                missed = jnp.sum(jax.vmap(
                    lambda s_, gg, mm: window_match_counts(
                        s_, gg, mm, off3, level_extent(s))
                )(ms, g, m))
                self.sow("diagnostics", "conv_window_missed", missed)
            return w

        if dense:
            y3, ms5 = WindowSubMConv(
                self.in_channels, self.base_channels, off5,
                window=self.conv_window, name="conv_input")(feat, grid, mask)
            if self.conv_coverage_check:
                from ...ops.window_conv import window_match_counts

                missed5 = jnp.sum(jax.vmap(
                    lambda s_, g_, m_: window_match_counts(
                        s_, g_, m_, off5, level_extent(0))
                )(ms5, grid, mask))
                self.sow("diagnostics", "conv_window_missed", missed5)
            y = y3.reshape(b * n, -1)
        else:
            nbr5 = _flatten_nbr(make_nbr(grid, mask, off5, 0))
            y = SubMConv(self.in_channels, self.base_channels,
                         off5.shape[0], name="conv_input")(flat_feat, nbr5)
        y = bn(self.base_channels, name="bn_input")(y, flat_mask, train, ctx)
        y = nn.relu(y)
        y = jnp.where(flat_mask[:, None], y, 0.0)

        # encoder: per level keep (feat, mask, nbr-or-window-ctx) + maps
        level_grid, level_mask = grid, mask
        nbr3 = (None if dense else
                _flatten_nbr(make_nbr(level_grid, level_mask, off3, 0)))
        wctx = make_wctx(level_grid, level_mask, 0) if dense else None
        skips = [(y, flat_mask, nbr3, wctx)]
        down_maps = []  # (c2p_flat, pos, valid, child_mask_flat)
        enc_channels = self.base_channels
        level_n = n
        for s in range(num_stages):
            n_child = level_n
            level_n = max(
                int(level_n * self.level_capacity_factor),
                min(self.min_level_capacity, n_child),
            )
            pos = (
                (level_grid[..., 0] % 2) * 4
                + (level_grid[..., 1] % 2) * 2
                + (level_grid[..., 2] % 2)
            ).reshape(b * n_child)
            p_grid, p_mask, c2p = jax.vmap(
                lambda g, m: pool_fn(g, m, 2, capacity=level_n)
            )(level_grid, level_mask)
            c2p_flat = _flatten_map(c2p, level_n)
            valid = c2p_flat >= 0
            if self.level_capacity_factor < 1.0:
                # children of capacity-overflow parents map to -1; make
                # any drop visible instead of silently losing voxels
                child_valid = level_mask.reshape(b * n_child)
                self.sow("diagnostics", "capacity_dropped_points",
                         jnp.sum(child_valid & ~valid))
            flat_p_mask = p_mask.reshape(b * level_n)
            y = SparseDownConv(y.shape[-1], self.channels[s],
                               name=f"down{s}")(
                y, c2p_flat, pos, valid, b * level_n
            )
            y = bn(self.channels[s], name=f"down_bn{s}")(
                y, flat_p_mask, train, ctx
            )
            y = nn.relu(y)
            y = jnp.where(flat_p_mask[:, None], y, 0.0)
            down_maps.append((c2p_flat, pos, valid))

            level_grid, level_mask = p_grid, p_mask
            nbr3 = (None if dense else _flatten_nbr(
                make_nbr(level_grid, level_mask, off3, s + 1)))
            wctx = (make_wctx(level_grid, level_mask, s + 1)
                    if dense else None)
            for i in range(self.layers[s]):
                y = block_cls(
                    y.shape[-1], self.channels[s], norm=bn,
                    name=f"enc{s}_block{i}",
                )(y, nbr3, flat_p_mask, train, ctx, wctx=wctx)
            enc_channels = y.shape[-1]
            skips.append((y, flat_p_mask, nbr3, wctx))

        if not self.cls_mode:
            # decoder mirrors the encoder through the saved down maps;
            # up[s] outputs channels[len-s-1] (the reference's build-loop
            # dec_channels at step s, spconv_unet_v1m1_base.py:166-212)
            y, out_mask, _, _ = skips.pop()
            for s in reversed(range(num_stages)):
                dec_channels = self.channels[len(self.channels) - s - 1]
                c2p_flat, pos, valid = down_maps[s]
                skip_feat, skip_mask, skip_nbr, skip_wctx = skips.pop()
                y = SparseInverseConv(
                    y.shape[-1], dec_channels, name=f"up{s}"
                )(y, c2p_flat, pos, valid)
                y = bn(dec_channels, name=f"up_bn{s}")(
                    y, skip_mask, train, ctx
                )
                y = nn.relu(y)
                y = jnp.concatenate([y, skip_feat], axis=-1)
                n_blocks = self.layers[len(self.layers) - s - 1]
                for i in range(n_blocks):
                    y = block_cls(y.shape[-1], dec_channels, norm=bn,
                                  name=f"dec{s}_block{i}")(
                        y, skip_nbr, skip_mask, train, ctx, wctx=skip_wctx
                    )
                out_mask = skip_mask
        else:
            out_mask = level_mask.reshape(b * level_n)

        if self.num_classes > 0:
            y = nn.Dense(self.num_classes, kernel_init=_trunc02,
                         name="final")(y)
        if self.cls_mode:
            y = masked_mean(
                y.reshape(b, level_n, -1), out_mask.reshape(b, level_n), axis=1
            )
            return y
        y = jnp.where(out_mask[:, None], y, 0.0)
        y = y.reshape(b, n, -1)
        if inv_perm is not None:
            y = jnp.take_along_axis(y, inv_perm[..., None], axis=1)
        return y


@MODELS.register_module("SpUNet-v1m2")
def spunet_v1m2(**kwargs):
    """bn-momentum variant registered for config parity (the momentum knob
    lives in MaskedBatchNorm; reference spconv_unet_v1m2_base.py)."""
    return SpUNet(**kwargs)


@MODELS.register_module("SpUNet-v1m3")
def spunet_v1m3(**kwargs):
    """PDNorm SpUNet (reference spconv_unet_v1m3_pdnorm.py:231-268):
    every BatchNorm becomes a per-dataset decoupled PDMaskedBatchNorm,
    optionally adaptive on the PPT context embedding."""
    kwargs.setdefault("conditions", ("ScanNet", "S3DIS", "Structured3D"))
    return SpUNet(**kwargs)


def _mink_unet(layers, channels, block="basic", **kwargs):
    kw = dict(layers=layers, channels=channels, block=block)
    kw.update(kwargs)                     # config values win over the preset
    kw.setdefault("base_channels", kw["channels"][0])
    return SpUNet(**kw)


# MinkUNet family: in the reference these are MinkowskiEngine residual
# sparse-conv U-Nets (models/sparse_unet/mink_unet.py:365-443).  They are
# the same architecture class as SpUNet (sparse voxel conv encoder/decoder
# with residual blocks), so the TPU build realises them on the identical
# gather/GEMM/scatter stack with the Mink depth/width (PLANES) presets;
# 50/101 use the Bottleneck (1-3-1, expansion 4) block like the reference.
_MINK_BASE_PLANES = (32, 64, 128, 256, 256, 128, 96, 96)


def _register_mink(name, layers, planes=_MINK_BASE_PLANES, block="basic"):
    @MODELS.register_module(name)
    def _factory(**kwargs):
        kw = dict(layers=layers, channels=planes, block=block)
        kw.update(kwargs)                 # config values win over the preset
        return _mink_unet(**kw)

    _factory.__name__ = name
    return _factory


# base depths (mink_unet.py:365-396)
_L14 = (1, 1, 1, 1, 1, 1, 1, 1)
_L18 = (2, 2, 2, 2, 2, 2, 2, 2)
_L34 = (2, 3, 4, 6, 2, 2, 2, 2)
_L101 = (2, 3, 4, 23, 2, 2, 2, 2)

_register_mink("MinkUNet14", _L14)
_register_mink("MinkUNet18", _L18)
_register_mink("MinkUNet34", _L34)
_register_mink("MinkUNet50", _L34, block="bottleneck")
_register_mink("MinkUNet101", _L101, block="bottleneck")
# lettered width variants (mink_unet.py:398-443); 34C's PLANES equal the
# base PLANES in the reference, so MinkUNet34C == MinkUNet34 by design
_register_mink("MinkUNet14A", _L14, (32, 64, 128, 256, 128, 128, 96, 96))
_register_mink("MinkUNet14B", _L14, (32, 64, 128, 256, 128, 128, 128, 128))
_register_mink("MinkUNet14C", _L14, (32, 64, 128, 256, 192, 192, 128, 128))
_register_mink("MinkUNet14D", _L14, (32, 64, 128, 256, 384, 384, 384, 384))
_register_mink("MinkUNet18A", _L18, (32, 64, 128, 256, 128, 128, 96, 96))
_register_mink("MinkUNet18B", _L18, (32, 64, 128, 256, 128, 128, 128, 128))
_register_mink("MinkUNet18D", _L18, (32, 64, 128, 256, 384, 384, 384, 384))
_register_mink("MinkUNet34A", _L34, (32, 64, 128, 256, 256, 128, 96, 96))
_register_mink("MinkUNet34B", _L34, (32, 64, 128, 256, 256, 128, 64, 32))
_register_mink("MinkUNet34C", _L34, _MINK_BASE_PLANES)
