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
