"""Headline benchmark: PT-v1 Seg50 inference throughput (points/sec/chip).

Mirrors the reference's ScanNetv2 fragment-inference hot path
(pointcept/engines/test.py:189-251: per-fragment forward of the PT-v1
U-Net) on one chip with static padded shapes.  Steady-state timing over
jit-compiled steps; prints ONE JSON line for the driver.

``vs_baseline`` is measured throughput divided by an assumed A100
reference throughput for the same model/workload.  The reference repo
publishes no points/sec numbers (SURVEY.md §6), so we use a fixed,
deliberately generous estimate: PT-v1 Seg50 inference on A100 with the
CUDA pointops stack at ~2.0e6 points/sec (the sequential FPS kernel and
per-point kNN heap kernels bound it well below matmul peak at
~100k-point scenes).  Revise when a measured A100 number lands in
BASELINE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_POINTS_PER_SEC_EST = 2.0e6

BATCH = 4
N_POINTS = 32768  # ~ one ScanNet voxel fragment per sample
NUM_CLASSES = 20
WARMUP = 3
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
    base_coord = rng.rand(BATCH, N_POINTS, 3).astype(np.float32) * 5.0
    batch = dict(
        coord=jnp.asarray(base_coord),
        feat=jnp.asarray(rng.rand(BATCH, N_POINTS, 6).astype(np.float32)),
        mask=jnp.ones((BATCH, N_POINTS), bool),
    )
    # distinct inputs per timed iteration so no result can be reused
    shifts = [jnp.asarray(np.float32(0.01 * i)) for i in range(ITERS)]
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch
    )

    @jax.jit
    def forward(variables, batch, shift):
        shifted = dict(batch, coord=batch["coord"] + shift)
        return model.apply(variables, shifted, train=False)["seg_logits"]

    # compile + warmup
    out = forward(variables, batch, shifts[0])
    out.block_until_ready()
    for i in range(WARMUP):
        forward(variables, batch, shifts[i % ITERS]).block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = forward(variables, batch, shifts[i])
    out.block_until_ready()
    dt = time.perf_counter() - t0

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
