"""Numerical contracts for geometry ops vs naive numpy references.

Mirrors the reference's op-verification strategy
(libs/pointops2/functions/test_*.py: custom kernel vs naive composition).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudpdf_tpu.ops import (
    ball_query,
    blocked_farthest_point_sampling,
    farthest_point_sampling,
    grouping,
    interpolation,
    knn,
    mask_from_count,
)


def naive_knn(query, ref, k, ref_mask=None):
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    if ref_mask is not None:
        d[:, ~ref_mask] = np.inf
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


class TestKNN:
    def test_small_exact(self, rng):
        q = rng.randn(37, 3).astype(np.float32)
        r = rng.randn(53, 3).astype(np.float32)
        idx, d2 = jax.jit(lambda a, b: knn(a, b, 4))(q, r)
        nidx, nd2 = naive_knn(q, r, 4)
        np.testing.assert_allclose(np.sort(d2, 1), np.sort(nd2, 1), rtol=1e-4, atol=1e-4)
        # distances identify the same neighbor sets (ties aside)
        np.testing.assert_allclose(d2, nd2, rtol=1e-4, atol=1e-4)

    def test_chunked_matches_full(self, rng):
        q = rng.randn(300, 3).astype(np.float32)
        r = rng.randn(500, 3).astype(np.float32)
        idx_full, d_full = knn(q, r, 8)
        idx_c, d_c = knn(q, r, 8, chunk_size=64, query_tile=128)
        np.testing.assert_allclose(d_full, d_c, rtol=1e-4, atol=1e-4)

    def test_ref_mask(self, rng):
        q = rng.randn(20, 3).astype(np.float32)
        r = rng.randn(40, 3).astype(np.float32)
        rmask = np.zeros(40, bool)
        rmask[:25] = True
        idx, d2 = knn(q, r, 5, ref_mask=jnp.asarray(rmask))
        nidx, nd2 = naive_knn(q, r, 5, ref_mask=rmask)
        np.testing.assert_allclose(d2, nd2, rtol=1e-4, atol=1e-4)
        assert np.all(np.asarray(idx) < 25)

    def test_fewer_valid_than_k(self, rng):
        q = rng.randn(10, 3).astype(np.float32)
        r = rng.randn(10, 3).astype(np.float32)
        rmask = np.zeros(10, bool)
        rmask[:3] = True
        idx, d2 = knn(q, r, 5, ref_mask=jnp.asarray(rmask))
        d2 = np.asarray(d2)
        assert np.all(np.isfinite(d2[:, :3]))
        assert np.all(np.isinf(d2[:, 3:]))

    def test_self_is_first_neighbor(self, rng):
        p = rng.randn(64, 3).astype(np.float32)
        idx, d2 = knn(p, p, 3)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(64))
        np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-5)


class TestBallQuery:
    def test_radius_filter(self, rng):
        q = rng.rand(30, 3).astype(np.float32)
        r = rng.rand(60, 3).astype(np.float32)
        radius = 0.3
        idx, nmask = ball_query(q, r, radius, 8)
        idx, nmask = np.asarray(idx), np.asarray(nmask)
        d = ((q[:, None] - r[None]) ** 2).sum(-1)
        for i in range(30):
            for j in range(8):
                if nmask[i, j]:
                    assert d[i, idx[i, j]] <= radius**2 + 1e-5
        # padded slots repeat the first neighbor
        assert np.all(idx[~nmask] == np.take(idx[:, 0], np.where(~nmask)[0]))

    def test_min_radius(self, rng):
        q = rng.rand(20, 3).astype(np.float32)
        idx, nmask = ball_query(q, q, 0.5, 8, min_radius=0.01)
        # self (distance 0) must be excluded by min_radius
        idx, nmask = np.asarray(idx), np.asarray(nmask)
        for i in range(20):
            assert not np.any((idx[i][nmask[i]] == i))


class TestGrouping:
    def test_gather(self, rng):
        feat = rng.randn(50, 7).astype(np.float32)
        idx = rng.randint(0, 50, size=(20, 6))
        out = grouping(jnp.asarray(feat), jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(out), feat[idx], rtol=1e-6)

    def test_with_coord(self, rng):
        feat = rng.randn(50, 7).astype(np.float32)
        coord = rng.randn(50, 3).astype(np.float32)
        new_coord = rng.randn(20, 3).astype(np.float32)
        idx = rng.randint(0, 50, size=(20, 6))
        out = np.asarray(
            grouping(jnp.asarray(feat), jnp.asarray(idx), jnp.asarray(coord),
                     jnp.asarray(new_coord), with_coord=True)
        )
        assert out.shape == (20, 6, 10)
        np.testing.assert_allclose(
            out[..., :3], coord[idx] - new_coord[:, None, :], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(out[..., 3:], feat[idx], rtol=1e-6)


class TestInterpolation:
    def test_idw(self, rng):
        src_c = rng.rand(40, 3).astype(np.float32)
        dst_c = rng.rand(25, 3).astype(np.float32)
        src_f = rng.randn(40, 5).astype(np.float32)
        out = np.asarray(interpolation(src_c, dst_c, src_f, k=3))
        # naive IDW
        d = np.sqrt(((dst_c[:, None] - src_c[None]) ** 2).sum(-1))
        idx = np.argsort(d, 1)[:, :3]
        dd = np.take_along_axis(d, idx, 1)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(1, keepdims=True)
        expected = (src_f[idx] * w[..., None]).sum(1)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_exact_on_coincident(self, rng):
        src_c = rng.rand(30, 3).astype(np.float32)
        src_f = rng.randn(30, 4).astype(np.float32)
        out = np.asarray(interpolation(src_c, src_c, src_f, k=3))
        # coincident point dominates via 1/eps weight
        np.testing.assert_allclose(out, src_f, rtol=1e-2, atol=1e-2)


class TestFPS:
    def naive_fps(self, coord, m, start=0):
        N = coord.shape[0]
        picked = [start]
        dist = np.full(N, np.inf)
        for _ in range(m - 1):
            d = ((coord - coord[picked[-1]]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            picked.append(int(np.argmax(dist)))
        return np.array(picked)

    def test_exact_matches_naive(self, rng):
        coord = rng.randn(100, 3).astype(np.float32)
        idx = np.asarray(farthest_point_sampling(coord, 16))
        expected = self.naive_fps(coord, 16)
        np.testing.assert_array_equal(idx, expected)

    def test_masked_never_selects_invalid(self, rng):
        coord = rng.randn(64, 3).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:40] = True
        idx = np.asarray(farthest_point_sampling(coord, 10, mask=jnp.asarray(mask)))
        assert np.all(idx < 40)

    def test_blocked_coverage(self, rng):
        # blocked FPS must produce distinct, well-spread valid points
        coord = rng.rand(512, 3).astype(np.float32)
        idx, valid = blocked_farthest_point_sampling(coord, 128, num_groups=8)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert valid.all()
        assert len(np.unique(idx)) == 128

    def test_blocked_with_padding(self, rng):
        coord = rng.rand(512, 3).astype(np.float32)
        mask = np.zeros(512, bool)
        mask[:300] = True
        idx, valid = blocked_farthest_point_sampling(
            coord, 128, mask=jnp.asarray(mask), num_groups=8
        )
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert np.all(mask[idx[valid]])
        # most picks must be valid (300 valid >> 128 picks)
        assert valid.sum() >= 100


class TestMask:
    def test_mask_from_count(self):
        m = np.asarray(mask_from_count(jnp.array([2, 0, 5]), 5))
        expected = np.array(
            [[1, 1, 0, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=bool
        )
        np.testing.assert_array_equal(m, expected)


class TestKnnSerial:
    """Serialization-window kNN (the TPU large-N fallback, dispatched
    for refs beyond ~131k where the O(M*N) fused-brute select stream
    becomes the bottleneck) vs float64 ground truth.

    Recall is distance-based: a returned slot counts iff its distance is
    within the true k-th radius (+ float32 tie tolerance).  Curve
    windows are approximate by construction — bars reflect measured
    behavior per cloud type (uniform 3D is the hardest case for
    space-filling-curve locality; voxelized scans and cross-set queries
    do better).
    """

    def _dist_recall(self, query, ref, k, ref_mask=None, **kw):
        import jax
        from scipy.spatial import cKDTree

        from pointcloudpdf_tpu.ops.geometry import knn_serial

        if query is ref:
            g_idx, g_d2 = jax.jit(
                lambda r, m: knn_serial(r, r, k, ref_mask=m, **kw)
            )(ref, ref_mask)
        else:
            g_idx, g_d2 = jax.jit(
                lambda q, r, m: knn_serial(q, r, k, ref_mask=m, **kw)
            )(query, ref, ref_mask)
        g_d2 = np.asarray(g_d2)
        rnp = np.asarray(ref, np.float64)
        if ref_mask is not None:
            rnp = rnp[np.asarray(ref_mask)]
        kk = min(k, len(rnp))
        true_d, _ = cKDTree(rnp).query(np.asarray(query, np.float64), k=kk)
        true_kth2 = (true_d[:, -1] ** 2) if kk > 1 else true_d ** 2
        tol = 1e-6 + 1e-5 * true_kth2
        ok = g_d2[:, :kk] <= (true_kth2[:, None] + tol[:, None])
        return float(ok.mean())

    def test_uniform_cloud(self, rng):
        import jax.numpy as jnp

        ref = jnp.asarray(rng.rand(4096, 3).astype(np.float32) * 4.0)
        assert self._dist_recall(ref, ref, 16) >= 0.95

    def test_voxelized_surface(self, rng):
        import jax.numpy as jnp

        pts = np.concatenate(
            [rng.rand(60000, 2) * 6.0,
             np.sin(rng.rand(60000, 1) * 6) + rng.randn(60000, 1) * 0.02],
            axis=1)
        vox = np.unique(np.floor(pts / 0.04).astype(np.int64), axis=0)
        ref = jnp.asarray(vox[:4096].astype(np.float32) * 0.04)
        assert self._dist_recall(ref, ref, 16) >= 0.96

    def test_long_extent_cloud(self, rng):
        import jax.numpy as jnp

        ref = rng.rand(4096, 3).astype(np.float32)
        ref[:, 0] *= 60.0  # outdoor-scan aspect ratio
        ref = jnp.asarray(ref)
        assert self._dist_recall(ref, ref, 8) >= 0.99

    def test_cross_set_queries(self, rng):
        """FPS-downsample and interpolation shapes (the model's cross
        calls) rank into the ref ordering by binary search."""
        import jax.numpy as jnp

        pts = np.concatenate(
            [rng.rand(60000, 2) * 6.0,
             np.sin(rng.rand(60000, 1) * 6) + rng.randn(60000, 1) * 0.02],
            axis=1)
        vox = np.unique(np.floor(pts / 0.04).astype(np.int64), axis=0)
        ref = jnp.asarray(vox[:4096].astype(np.float32) * 0.04)
        sub = jnp.asarray(np.asarray(ref)[rng.permutation(4096)[:1024]])
        assert self._dist_recall(sub, ref, 16) >= 0.98     # downsample
        assert self._dist_recall(ref, sub, 3) >= 0.98      # upsample

    def test_mask_exclusion_and_sorted(self, rng):
        import jax
        import jax.numpy as jnp

        from pointcloudpdf_tpu.ops.geometry import knn_serial

        ref = jnp.asarray(rng.rand(2048, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(512, 3).astype(np.float32))
        mask = np.ones(2048, bool)
        mask[1500:] = False
        idx, d2 = jax.jit(
            lambda q, r, m: knn_serial(q, r, 8, ref_mask=m)
        )(query, ref, jnp.asarray(mask))
        idx, d2 = np.asarray(idx), np.asarray(d2)
        # masked refs never appear in results
        assert not np.isin(idx[np.isfinite(d2)], np.arange(1500, 2048)).any()
        finite = np.isfinite(d2)
        assert (np.diff(np.where(finite, d2, np.inf), axis=1)
                [finite[:, 1:]] >= -1e-6).all()

    def test_self_recovered(self, rng):
        import jax
        import jax.numpy as jnp

        from pointcloudpdf_tpu.ops.geometry import knn_serial

        ref = jnp.asarray(rng.rand(1024, 3).astype(np.float32))
        idx, d2 = jax.jit(lambda r: knn_serial(r, r, 8))(ref)
        assert np.allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-9)
