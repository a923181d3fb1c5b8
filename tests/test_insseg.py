"""PointGroup + clustering + InsSegEvaluator tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import jit_apply, jit_init
from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.ops.cluster import bfs_cluster


class TestClustering:
    def test_two_blobs_split(self):
        rng = np.random.RandomState(0)
        a = rng.randn(60, 3) * 0.1
        b = rng.randn(60, 3) * 0.1 + 10.0
        center = np.concatenate([a, b])
        segment = np.zeros(120, np.int64)
        clusters = bfs_cluster(center, segment, radius=1.0, min_points=10)
        assert len(clusters) == 2
        sizes = sorted(len(c) for c in clusters)
        assert sizes == [60, 60]

    def test_semantic_constraint(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(80, 3) * 0.1  # one spatial blob
        segment = np.repeat([0, 1], 40)
        clusters = bfs_cluster(pts, segment, radius=1.0, min_points=10)
        assert len(clusters) == 2  # split by class despite proximity

    def test_min_points_filter(self):
        pts = np.zeros((5, 3))
        clusters = bfs_cluster(pts, np.zeros(5, np.int64), 1.0, min_points=10)
        assert clusters == []


@pytest.fixture(scope="module")
def pg_model():
    return build_model(
        dict(
            type="PG-v1m1",
            backbone=dict(
                type="SpUNet-v1m1", in_channels=6, num_classes=0,
                base_channels=8, channels=(8, 16, 16, 8),
                layers=(1, 1, 1, 1),
            ),
            backbone_out_channels=8,
            semantic_num_classes=5,
            segment_ignore_index=(-1, 0),
            cluster_thresh=1.5,
            cluster_propose_points=5,
            cluster_min_points=3,
            voxel_size=0.05,
        )
    )


def make_batch(rng, B=2, N=128):
    coord = rng.rand(B, N, 3).astype(np.float32)
    grid = (coord / 0.05).astype(np.int32)
    mask = np.ones((B, N), bool)
    segment = rng.randint(1, 5, (B, N)).astype(np.int64)
    instance = rng.randint(0, 4, (B, N)).astype(np.int64)
    centroid = rng.rand(B, N, 3).astype(np.float32)
    return dict(
        coord=jnp.asarray(coord),
        grid_coord=jnp.asarray(grid),
        feat=jnp.asarray(rng.rand(B, N, 6).astype(np.float32)),
        mask=jnp.asarray(mask),
        segment=jnp.asarray(segment),
        instance=jnp.asarray(instance),
        instance_centroid=jnp.asarray(centroid),
    )


class TestPointGroup:
    def test_train_output_and_loss(self, pg_model):
        rng = np.random.RandomState(0)
        batch = make_batch(rng)
        variables = jit_init(pg_model, {"params": jax.random.PRNGKey(0)},
                             batch, train=True)
        out = jit_apply(pg_model, variables, batch,
                        train=True, mutable=["batch_stats"])[0]
        assert out["seg_logits"].shape == (2, 128, 5)
        assert out["bias_pred"].shape == (2, 128, 3)
        for key in ("loss", "seg_loss", "bias_l1_loss", "bias_cosine_loss"):
            assert np.isfinite(float(out[key])), key

    def test_propose(self, pg_model):
        rng = np.random.RandomState(0)
        n = 60
        coord = np.zeros((n, 3), np.float32)
        coord[:30] = rng.randn(30, 3) * 0.01
        coord[30:] = rng.randn(30, 3) * 0.01 + 5.0
        logits = np.zeros((n, 5), np.float32)
        logits[:, 2] = 10.0  # all points confidently class 2 (not ignored)
        bias = np.zeros((n, 3), np.float32)
        masks, classes, scores = pg_model.propose(
            coord, logits, bias, np.ones(n, bool)
        )
        assert len(masks) == 2
        assert set(classes.tolist()) == {2}
        assert ((scores > 0.9) & (scores <= 1.0)).all()
