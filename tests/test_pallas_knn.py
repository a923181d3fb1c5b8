"""Fused Pallas kNN kernel vs float64 ground truth (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.ops.pallas_knn import knn_pallas


def _truth(query, ref, mask, k):
    from scipy.spatial import cKDTree

    rnp = np.asarray(ref, np.float64)[np.asarray(mask)]
    d, _ = cKDTree(rnp).query(np.asarray(query, np.float64), k=k)
    return d


class TestKnnPallas:
    def test_recall_and_contract(self, rng):
        ref = jnp.asarray(rng.rand(5000, 3).astype(np.float32) * 4.0)
        mask = np.ones(5000, bool)
        mask[-400:] = False
        idx, d2 = knn_pallas(ref, ref, 16, jnp.asarray(mask),
                             interpret=True)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        # masked refs never surface
        assert not np.isin(idx[np.isfinite(d2)],
                           np.arange(4600, 5000)).any()
        # ascending, self recovered at ~0
        finite = np.isfinite(d2)
        assert (np.diff(np.where(finite, d2, np.inf), axis=1)
                [finite[:, 1:]] >= -1e-7).all()
        # the matmul-identity form leaves ~ulp(|q|^2) noise on the self
        # distance (it is not computed as an exact difference); masked
        # queries cannot find their (masked) selves
        assert np.allclose(d2[mask][:, 0], 0.0, atol=1e-4)
        # distance recall vs float64 truth (1% covers the packed-index
        # mantissa truncation)
        td = _truth(ref, ref, mask, 16)
        tk2 = td[:, -1] ** 2
        recall = float((d2 <= tk2[:, None] * 1.01 + 1e-6).mean())
        assert recall >= 0.98, recall

    def test_cross_set(self, rng):
        ref = jnp.asarray(rng.rand(3000, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(700, 3).astype(np.float32))
        mask = np.ones(3000, bool)
        idx, d2 = knn_pallas(query, ref, 8, jnp.asarray(mask),
                             interpret=True)
        d2 = np.asarray(d2)
        td = _truth(query, ref, mask, 8)
        tk2 = td[:, -1] ** 2
        assert float((d2 <= tk2[:, None] * 1.01 + 1e-6).mean()) >= 0.98

    def test_indices_match_distances(self, rng):
        """Each returned index's true distance equals the reported d2 up
        to the mantissa truncation."""
        ref = jnp.asarray(rng.rand(2500, 3).astype(np.float32))
        idx, d2 = knn_pallas(ref, ref, 8, interpret=True)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        rnp = np.asarray(ref, np.float64)
        true_d2 = ((rnp[:, None, :] - rnp[idx]) ** 2).sum(-1)
        finite = np.isfinite(d2)
        err = np.abs(true_d2[finite] - d2[finite])
        ok = err <= 1e-5 + 0.01 * true_d2[finite]
        assert ok.mean() > 0.999


class TestKnnPallasPruned:
    """Bound-pruned variant (z-sort + bbox chunk skipping) — small chunk
    sizes so the pruning machinery engages at test scale.

    Tolerances carry an absolute term: pallas interpret mode emulates the
    MXU by rounding every dot's inputs AND output to bf16, so interpreted
    distances sit within ~|q||r| * 2^-9 of the true values no matter how
    the kernel splits operands.  Exact-arithmetic parity is asserted
    on-chip by bench.py's knn_recall (>= 0.99 through the live dispatch,
    which auto-selects this pruned kernel at fragment sizes)."""

    # chunk/group keep per-chunk fold width (chunk/group = 128 lanes)
    # comfortably above k: z-sorting concentrates the true top-k into one
    # chunk, so a narrow fold would shadow same-lane neighbors (the
    # production config's 2048/8 = 256 lanes has the same property)
    KW = dict(interpret=True, tile_q=64, chunk=512, group=4, prune=True)
    NOISE = 2e-3  # interpret-mode bf16 dot-output rounding, scale ~4

    def _recall(self, d2, td):
        tk2 = td[:, -1] ** 2
        return float((np.asarray(d2)
                      <= tk2[:, None] * 1.01 + self.NOISE).mean())

    def test_matches_unpruned(self, rng):
        """Pruning must not lose candidates the unpruned kernel keeps.

        Elementwise list equality is too strict — when either path drops
        one marginal neighbor to fold shadowing, every later rank shifts.
        The stable per-row quantity is the kth (worst kept) distance:
        pruning may only change it within the shared noise envelope."""
        ref = jnp.asarray(rng.rand(6144, 3).astype(np.float32) * 4.0)
        _, d2_p = knn_pallas(ref, ref, 16, **self.KW)
        _, d2_b = knn_pallas(ref, ref, 16, tile_q=64, chunk=512, group=4,
                             interpret=True, prune=False)
        kth_p = np.asarray(d2_p)[:, -1]
        kth_b = np.asarray(d2_b)[:, -1]
        worse = kth_p > kth_b * 1.05 + self.NOISE
        assert worse.mean() <= 0.02, worse.mean()
        td = _truth(ref, ref, np.ones(6144, bool), 16)
        assert self._recall(d2_p, td) >= 0.98

    def test_clustered_adversarial(self, rng):
        """Tight clusters: all neighbors in one chunk; far chunks must
        prune away without losing any."""
        centers = rng.rand(8, 3).astype(np.float32) * 50.0
        pts = (centers[rng.randint(0, 8, 6144)]
               + rng.randn(6144, 3).astype(np.float32) * 0.05)
        ref = jnp.asarray(pts)
        idx, d2 = knn_pallas(ref, ref, 8, **self.KW)
        td = _truth(ref, ref, np.ones(6144, bool), 8)
        assert self._recall(d2, td) >= 0.98

    def test_masked_and_cross(self, rng):
        ref = jnp.asarray(rng.rand(6144, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(500, 3).astype(np.float32))
        mask = np.ones(6144, bool)
        mask[::5] = False
        idx, d2 = knn_pallas(query, ref, 8, jnp.asarray(mask), **self.KW)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        assert not np.isin(idx[np.isfinite(d2)],
                           np.where(~mask)[0]).any()
        td = _truth(query, ref, mask, 8)
        assert self._recall(d2, td) >= 0.98

    def test_indices_match_distances(self, rng):
        ref = jnp.asarray(rng.rand(6144, 3).astype(np.float32) * 2.0)
        idx, d2 = knn_pallas(ref, ref, 8, **self.KW)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        rnp = np.asarray(ref, np.float64)
        true_d2 = ((rnp[:, None, :] - rnp[idx]) ** 2).sum(-1)
        finite = np.isfinite(d2)
        err = np.abs(true_d2[finite] - d2[finite])
        ok = err <= 1e-5 + 0.01 * true_d2[finite]
        assert ok.mean() > 0.999
