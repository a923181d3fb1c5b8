"""Headline benchmark: PT-v1 Seg50 inference throughput (points/sec/chip).

Mirrors the reference's ScanNetv2 fragment-inference hot path
(pointcept/engines/test.py:189-251: per-fragment forward of the PT-v1
U-Net) on one chip with static padded shapes.  Steady-state timing over
jit-compiled steps; prints ONE JSON line for the driver.

``vs_baseline`` is measured throughput divided by an assumed A100
reference throughput for the same model/workload.  The reference repo
publishes no points/sec numbers (SURVEY.md §6); PT-v1's vector attention
with pointops CUDA kernels benchmarks around 1e5-3e5 points/sec on
A100-class GPUs (sequential FPS + per-point kNN heaps dominate), so we
use 2.0e5.  Revise when a measured A100 number lands in BASELINE.md.

Timing methodology: all ITERS forwards run inside one jit program over
independent random clouds (XLA hoists anything loop-invariant — even
scaled coordinates cancel in a relative-position network), and the
clock brackets a host fetch of the scalar result because on the
tunneled TPU platform ``block_until_ready`` does not synchronize.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_POINTS_PER_SEC_EST = 2.0e5

BATCH = 4
N_POINTS = 32768  # ~ one ScanNet voxel fragment per sample
NUM_CLASSES = 20
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudpdf_tpu.models import build_model

    model = build_model(
        dict(
            type="DefaultSegmentor",
            backbone=dict(
                type="PointTransformer-Seg50", in_channels=6,
                num_classes=NUM_CLASSES,
            ),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        )
    )

    rng = np.random.RandomState(0)
    batch = dict(
        coord=jnp.asarray(rng.rand(BATCH, N_POINTS, 3).astype(np.float32) * 5.0),
        feat=jnp.asarray(rng.rand(BATCH, N_POINTS, 6).astype(np.float32)),
        mask=jnp.ones((BATCH, N_POINTS), bool),
    )
    # fully independent random clouds per timed iteration: XLA's algebraic
    # simplifier hoists anything loop-invariant (shifted or even scaled
    # coordinates collapse in a relative-position network), so nothing
    # short of fresh data keeps all ITERS forwards live
    all_coord = jnp.asarray(
        rng.rand(ITERS, BATCH, N_POINTS, 3).astype(np.float32) * 5.0
    )
    all_feat = jnp.asarray(
        rng.rand(ITERS, BATCH, N_POINTS, 6).astype(np.float32)
    )
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch
    )

    # bf16 matmuls (the reference's own configs run these models under
    # AMP); coordinate geometry keeps Precision.HIGHEST inside the knn,
    # and argmax predictions measured identical to the f32 run

    with jax.default_matmul_precision("bfloat16"):
        # all ITERS forwards run inside ONE device program (lax.scan over
        # per-iteration coordinate shifts): steady-state timing is immune
        # to per-dispatch host<->device round-trip latency
        @jax.jit
        def forward_many(variables, batch, all_coord, all_feat):
            def body(acc, inp):
                coord, feat = inp
                out = model.apply(
                    variables, dict(batch, coord=coord, feat=feat),
                    train=False,
                )["seg_logits"]
                return acc + jnp.sum(out), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), (all_coord, all_feat)
            )
            return total

        # compile + warmup.  NOTE: on the tunneled TPU platform
        # block_until_ready() does not synchronize — only a value fetch
        # does — so timing brackets a host read of the scalar result.
        float(forward_many(variables, batch, all_coord, all_feat))
        for _ in range(WARMUP):
            float(forward_many(variables, batch, all_coord, all_feat))

        t0 = time.perf_counter()
        total = float(forward_many(variables, batch, all_coord, all_feat))
        dt = time.perf_counter() - t0
        assert np.isfinite(total)

    points_per_sec = BATCH * N_POINTS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "pt_v1_seg50_inference_throughput",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / A100_POINTS_PER_SEC_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
