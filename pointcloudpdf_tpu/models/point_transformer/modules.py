"""Point Transformer v1 building blocks, TPU-first.

Re-expression of the reference PT-v1 blocks
(pointcept/models/point_transformer/point_transformer_seg.py:19-192) over
padded batches: the pointops CUDA calls (knn_query_and_group, FPS,
interpolation) become batched jnp ops with static neighbor tables, and the
vector attention is a fully dense masked computation that XLA fuses onto
MXU/VPU. The reference's ``LayerNorm1d`` is BatchNorm over the neighbor
axis (models/point_transformer/utils.py), reproduced here with
MaskedBatchNorm over (B, N, K).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.geometry import grouping, interpolation, knn
from ...ops.sampling import blocked_farthest_point_sampling
from ..norm import MaskedBatchNorm
from ..utils.structure import Points, masked_max, masked_mean, masked_softmax

# Trace-time dispatch for the fused Pallas attention kernels
# (ops/pallas_attention.py): "auto" uses them on TPU for BOTH eval (folded
# running-stat BNs) and training (custom VJP + XLA-side masked batch
# stats), "off" keeps the unfused jnp path, "interpret" forces the kernels
# in interpreter mode (CPU tests).  Single-device only: under a >1-device
# mesh the trainer flips this to "off" (pallas_call has no GSPMD
# partitioning rule for the flattened (B*N, ...) layout).
import os as _os

FUSED_ATTENTION = _os.environ.get("PCPDF_FUSED_ATTENTION", "auto")

# HBM dtype of the fused kernel's gathered [k|v] feature payload — the
# dominant byte stream of the whole network (bench: ~524 KB/pt f32).
# "bfloat16" halves it; relative positions always stay f32 (computed
# before the cast), and the kernel upcasts to f32 in VMEM for all
# arithmetic.  "float32" restores bit-parity with the unfused path.
FUSED_PAYLOAD_DTYPE = _os.environ.get("PCPDF_FUSED_PAYLOAD_DTYPE",
                                      "bfloat16")


def _bn_affine(bn: MaskedBatchNorm, c: int):
    """Fold an inference-mode BatchNorm into (scale, shift) by probing.

    Inference BN is affine, so two tiny probe calls recover the folded
    parameters exactly while creating the module's variables with the
    same names/shapes as the unfused path.
    """
    shift = bn(jnp.zeros((1, c), jnp.float32), train=False)[0]
    scale = bn(jnp.ones((1, c), jnp.float32), train=False)[0] - shift
    return scale, shift


def _dense_wb(dense: nn.Dense, c_in: int):
    """Recover (W, b) of a Dense by probing with the identity."""
    b = dense(jnp.zeros((1, c_in), jnp.float32))[0].astype(jnp.float32)
    w = dense(jnp.eye(c_in, dtype=jnp.float32)).astype(jnp.float32) - b
    return w, b


class PointTransformerLayer(nn.Module):
    """Vector self-attention over kNN neighborhoods.

    Equivalent computation to reference PointTransformerLayer
    (point_transformer_seg.py:19-78): per-point q/k/v projections, grouped
    relative-position encoding, subtraction relation, per-share-group
    softmax weights, weighted aggregation. mid_planes == out_planes in the
    reference, so the share-group reduction of p_r is the identity.
    """

    in_planes: int
    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: Points, train: bool = True,
                 nbr=None) -> jnp.ndarray:
        coord, x, mask = pts
        x = x.astype(self.dtype)
        mid = self.out_planes
        groups = self.out_planes // self.share_planes

        dense = functools.partial(nn.Dense, dtype=self.dtype)
        x_q = dense(mid, name="linear_q")(x)
        x_k = dense(mid, name="linear_k")(x)
        x_v = dense(self.out_planes, name="linear_v")(x)

        if nbr is None:
            idx, dist2 = jax.vmap(
                lambda q, r, m: knn(q, r, self.nsample, ref_mask=m)
            )(coord, coord, mask)
            nmask = jnp.isfinite(dist2) & mask[..., None]  # (B, N, K)
        else:
            # coords are constant within a stage, so the stage computes
            # the kNN table once and every block reuses it (the reference
            # re-queries per layer, point_transformer_seg.py:48-60)
            idx, nmask = nbr

        mode = FUSED_ATTENTION
        use_fused = mode in ("interpret",) or (
            mode == "auto" and jax.default_backend() == "tpu"
        )
        if use_fused:
            # fused Pallas path: the whole post-projection chain runs in
            # VMEM (ops/pallas_attention.py); modules are probed so the
            # parameter tree matches the unfused path exactly
            from ...ops.pallas_attention import (
                fused_vector_attention, fused_vector_attention_train)

            groups = self.out_planes // self.share_planes
            p1 = dense(3, name="linear_p1")
            bn_p = MaskedBatchNorm(3, name="bn_p")
            p2 = dense(self.out_planes, name="linear_p2")
            bn_w1 = MaskedBatchNorm(mid, name="bn_w1")
            w1 = dense(groups, name="linear_w1")
            bn_w2 = MaskedBatchNorm(groups, name="bn_w2")
            w2 = dense(groups, name="linear_w2")

            p1_w, p1_b = _dense_wb(p1, 3)
            p2_w, p2_b = _dense_wb(p2, 3)
            w1_w, w1_b = _dense_wb(w1, mid)
            w2_w, w2_b = _dense_wb(w2, groups)

            if train:
                # batch-stat BNs: stats computed from the shared payload
                # in XLA, folded affines consumed by the custom-VJP'd
                # kernel; train_affine also updates the running stats
                out = fused_vector_attention_train(
                    x_q.astype(jnp.float32), x_k.astype(jnp.float32),
                    x_v.astype(jnp.float32), coord, idx, nmask,
                    p1_w, p1_b, p2_w, p2_b, w1_w, w1_b, w2_w, w2_b,
                    bn_p.train_affine, bn_w1.train_affine,
                    bn_w2.train_affine,
                    share_planes=self.share_planes,
                    interpret=(mode == "interpret"),
                    payload_dtype=(jnp.bfloat16
                                   if FUSED_PAYLOAD_DTYPE == "bfloat16"
                                   else jnp.float32),
                ).astype(self.dtype)
                return jnp.where(mask[..., None], out, 0.0)

            bnp_s, bnp_t = _bn_affine(bn_p, 3)
            bnw1_s, bnw1_t = _bn_affine(bn_w1, mid)
            bnw2_s, bnw2_t = _bn_affine(bn_w2, groups)

            out = fused_vector_attention(
                x_q.astype(jnp.float32), x_k.astype(jnp.float32),
                x_v.astype(jnp.float32), coord, idx, nmask,
                p1_w, p1_b, p2_w, p2_b, w1_w, w1_b, w2_w, w2_b,
                bnp_s, bnp_t, bnw1_s, bnw1_t, bnw2_s, bnw2_t,
                share_planes=self.share_planes,
                interpret=(mode == "interpret"),
                payload_dtype=(jnp.bfloat16
                               if FUSED_PAYLOAD_DTYPE == "bfloat16"
                               else jnp.float32),
            ).astype(self.dtype)
            return jnp.where(mask[..., None], out, 0.0)

        k_g = jax.vmap(
            lambda f, i, c, nc: grouping(f, i, c, nc, with_coord=True)
        )(x_k, idx, coord, coord)                      # (B, N, K, 3+mid)
        v_g = jax.vmap(grouping)(x_v, idx)             # (B, N, K, out)
        p_r, k_g = k_g[..., :3], k_g[..., 3:]

        # positional encoding MLP: Dense(3) -> BN -> relu -> Dense(out)
        p_r = dense(3, name="linear_p1")(p_r.astype(self.dtype))
        p_r = MaskedBatchNorm(3, name="bn_p")(p_r, nmask, train)
        p_r = nn.relu(p_r)
        p_r = dense(self.out_planes, name="linear_p2")(p_r)

        # relation: k - q + sum of p_r share-groups (identity when mid==out)
        p_r_reduced = p_r.reshape(p_r.shape[:-1] + (-1, mid)).sum(axis=-2)
        r_qk = k_g - x_q[:, :, None, :] + p_r_reduced

        # weight MLP: BN -> relu -> Dense(groups) -> BN -> relu -> Dense(groups)
        w = MaskedBatchNorm(mid, name="bn_w1")(r_qk, nmask, train)
        w = nn.relu(w)
        w = dense(groups, name="linear_w1")(w)
        w = MaskedBatchNorm(groups, name="bn_w2")(w, nmask, train)
        w = nn.relu(w)
        w = dense(groups, name="linear_w2")(w)
        # softmax in f32: bf16 exp/normalize loses attention mass
        w = masked_softmax(w.astype(jnp.float32), nmask[..., None], axis=2)

        # aggregation: out[n, s, g] = sum_k (v + p_r)[n, k, s, g] * w[n, k, g]
        v_pe = (v_g + p_r).reshape(
            v_g.shape[:3] + (self.share_planes, groups)
        )
        out = jnp.einsum("bnksg,bnkg->bnsg", v_pe, w.astype(v_pe.dtype))
        out = out.reshape(x.shape[:2] + (self.out_planes,))
        return jnp.where(mask[..., None], out, 0.0)


class TransitionDown(nn.Module):
    """Strided downsampling: blocked FPS + kNN grouping + max-pool.

    Equivalent of reference TransitionDown (point_transformer_seg.py:81-119),
    with the sequential FPS CUDA kernel replaced by morton-blocked parallel
    FPS and the per-sample ``n_o = o//stride`` count handled by validity
    masks (downsampled capacity is N//stride statically).
    """

    in_planes: int
    out_planes: int
    stride: int = 1
    nsample: int = 16
    fps_group_steps: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: Points, train: bool = True) -> Points:
        coord, x, mask = pts
        x = x.astype(self.dtype)
        if self.stride == 1:
            y = nn.Dense(self.out_planes, use_bias=False, name="linear",
                         dtype=self.dtype)(x)
            y = MaskedBatchNorm(self.out_planes, name="bn")(y, mask, train)
            y = nn.relu(y)
            return Points(coord, jnp.where(mask[..., None], y, 0.0), mask)

        m = coord.shape[1] // self.stride
        idx, valid = jax.vmap(
            lambda c, mk: blocked_farthest_point_sampling(
                c, m, mask=mk, max_group_steps=self.fps_group_steps
            )
        )(coord, mask)
        new_coord = jnp.take_along_axis(coord, idx[..., None], axis=1)
        new_mask = valid

        nidx, ndist2 = jax.vmap(
            lambda q, r, mk: knn(q, r, self.nsample, ref_mask=mk)
        )(new_coord, coord, mask)
        nmask = jnp.isfinite(ndist2) & new_mask[..., None]
        grouped = jax.vmap(
            lambda f, i, c, nc: grouping(f, i, c, nc, with_coord=True)
        )(x, nidx, coord, new_coord)                  # (B, M, K, 3+C)

        y = nn.Dense(self.out_planes, use_bias=False, name="linear",
                     dtype=self.dtype)(grouped.astype(self.dtype))
        y = MaskedBatchNorm(self.out_planes, name="bn")(y, nmask, train)
        y = nn.relu(y)
        y = masked_max(y, nmask, axis=-2)             # (B, M, C)
        return Points(new_coord, jnp.where(new_mask[..., None], y, 0.0), new_mask)


class TransitionUp(nn.Module):
    """Decoder upsampling (reference point_transformer_seg.py:122-168).

    Head mode (``coarse=None``): concat per-sample global context.
    Fusion mode: skip projection + 3-NN inverse-distance interpolation of
    the coarser level.
    """

    in_planes: int
    out_planes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: Points, coarse: Optional[Points] = None,
                 train: bool = True) -> jnp.ndarray:
        coord, x, mask = pts
        x = x.astype(self.dtype)
        if coarse is None:
            # global-context head: x <- linear1([x ; linear2(mean(x))])
            ctx = masked_mean(x, mask, axis=1)                   # (B, C)
            ctx = nn.relu(nn.Dense(self.in_planes, name="linear2",
                                   dtype=self.dtype)(ctx))
            ctx = jnp.broadcast_to(ctx[:, None, :], x.shape)
            y = jnp.concatenate([x, ctx], axis=-1)
            y = nn.Dense(self.in_planes, name="linear1",
                         dtype=self.dtype)(y)
            y = MaskedBatchNorm(self.in_planes, name="bn1")(y, mask, train)
            y = nn.relu(y)
            return jnp.where(mask[..., None], y, 0.0)

        c_coord, c_x, c_mask = coarse
        skip = nn.Dense(self.out_planes, name="linear1",
                        dtype=self.dtype)(x)
        skip = MaskedBatchNorm(self.out_planes, name="bn1")(skip, mask, train)
        skip = nn.relu(skip)
        up = nn.Dense(self.out_planes, name="linear2",
                      dtype=self.dtype)(c_x.astype(self.dtype))
        up = MaskedBatchNorm(self.out_planes, name="bn2")(up, c_mask, train)
        up = nn.relu(up)
        up = jax.vmap(
            lambda sc, dc, sf, sm, dm: interpolation(
                sc, dc, sf, k=3, src_mask=sm, dst_mask=dm
            )
        )(c_coord, coord, up, c_mask, mask)
        y = skip + up
        return jnp.where(mask[..., None], y, 0.0)


class Bottleneck(nn.Module):
    """Residual PT block (reference point_transformer_seg.py:171-192)."""

    in_planes: int
    planes: int
    share_planes: int = 8
    nsample: int = 16
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: Points, train: bool = True, nbr=None) -> Points:
        coord, x, mask = pts
        x = x.astype(self.dtype)
        identity = x
        y = nn.Dense(self.planes, use_bias=False, name="linear1",
                     dtype=self.dtype)(x)
        y = MaskedBatchNorm(self.planes, name="bn1")(y, mask, train)
        y = nn.relu(y)
        y = PointTransformerLayer(
            self.planes, self.planes, self.share_planes, self.nsample,
            dtype=self.dtype, name="transformer",
        )(Points(coord, y, mask), train, nbr)
        y = MaskedBatchNorm(self.planes, name="bn2")(y, mask, train)
        y = nn.relu(y)
        y = nn.Dense(self.planes * self.expansion, use_bias=False,
                     name="linear3", dtype=self.dtype)(y)
        y = MaskedBatchNorm(self.planes * self.expansion, name="bn3")(y, mask, train)
        y = nn.relu(y + identity)
        return Points(coord, jnp.where(mask[..., None], y, 0.0), mask)
