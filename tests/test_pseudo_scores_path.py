"""The scores-only pseudo-labeling path vs the full-logits path.

Round-4 rewiring (VERDICT r3 item 6): the device sends only (B, N) msp +
normalized max-logit sheets and the host builds the ball-query table
itself (scipy cKDTree) from the coords it already owns.  These tests pin
that the decomposed path reproduces the original full-logits path
exactly, and that the host table matches the brute-force definition.
"""

import numpy as np

from pointcloudpdf_tpu.recognizers.pseudo_label import (
    host_ball_query, pseudo_labeling, pseudo_labeling_batch)


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_host_ball_query_matches_bruteforce():
    rng = np.random.RandomState(0)
    coord = rng.rand(300, 3).astype(np.float32)
    radius, k = 0.15, 12
    nbr = host_ball_query(coord, radius, k)
    d2 = ((coord[None] - coord[:, None]) ** 2).sum(-1)
    for i in range(0, 300, 37):
        inside = np.where(d2[i] <= radius * radius + 1e-12)[0]
        got = nbr[i][nbr[i] != -1]
        assert len(got) == min(len(inside), k)
        # nearest-k-in-radius, every entry genuinely in radius
        assert set(got) <= set(inside)
        if len(inside) <= k:
            assert set(got) == set(inside)


def test_lazy_neighbor_table_matches_eager():
    """Lazy rows must be bit-identical to the eager full-table query, in
    any access order, including duplicate and scalar indices."""
    from pointcloudpdf_tpu.recognizers.pseudo_label import LazyNeighborTable

    rng = np.random.RandomState(4)
    coord = rng.rand(400, 3).astype(np.float32)
    radius, k = 0.2, 10
    want = host_ball_query(coord, radius, k)
    lazy = LazyNeighborTable(coord, radius, k)
    assert lazy.shape == want.shape
    # scattered reads with repeats, then 2-D index arrays, then full scan
    idx = rng.randint(0, 400, size=50)
    np.testing.assert_array_equal(lazy[idx], want[idx])
    np.testing.assert_array_equal(lazy[np.int64(7)], want[7])
    two_d = idx[:20].reshape(4, 5)
    np.testing.assert_array_equal(lazy[two_d], want[two_d])
    np.testing.assert_array_equal(lazy[np.arange(400)], want)


def test_scores_path_equals_logits_path():
    rng = np.random.RandomState(1)
    n, c = 600, 8
    coord = rng.rand(n, 3).astype(np.float32) * 2.0
    logits = rng.randn(n, c).astype(np.float32) * 3.0
    blob = np.linalg.norm(coord - coord[0], axis=1) < 0.5
    logits[blob] = rng.randn(blob.sum(), c).astype(np.float32) * 0.05
    nbr = host_ball_query(coord, 0.25, 16)

    msp = _softmax(logits).max(-1)
    ml = logits.max(-1)
    ml = (ml - ml.min()) / (ml.max() - ml.min() + 1e-6)

    kw = dict(condition_from="msp", beta=1.5, seed_from="ml",
              seed_range=0.15, num_seed=30, slide_window=True)
    np.random.seed(7)
    want = pseudo_labeling(coord, logits, nbr,
                           rng=np.random.RandomState(3), **kw)
    np.random.seed(7)
    got = pseudo_labeling(coord, None, nbr, scores=(msp, ml),
                          rng=np.random.RandomState(3), **kw)
    np.testing.assert_array_equal(got, want)


def test_batch_scores_path_with_host_table():
    rng = np.random.RandomState(2)
    B, N, c = 2, 500, 6
    coord = rng.rand(B, N, 3).astype(np.float32) * 2.0
    logits = rng.randn(B, N, c).astype(np.float32) * 3.0
    count = np.array([N, N - 120])
    msp = _softmax(logits).max(-1)
    ml = np.zeros((B, N), np.float32)
    for i in range(B):
        m = logits[i, : count[i]].max(-1)
        ml[i, : count[i]] = (m - m.min()) / (m.max() - m.min() + 1e-6)

    kw = dict(condition_from="msp", beta=1.5, seed_from="ml",
              seed_range=0.15, num_seed=20, slide_window=True)
    np.random.seed(9)
    got = pseudo_labeling_batch(
        coord, None, None, count, seed=0, n_jobs=1,
        scores=(msp, ml), ball_radius=0.25, ball_k=16, **kw)
    assert got.shape == (B, N) and got.dtype == bool
    # padded slots never flagged
    assert not got[1, count[1]:].any()

    # equals the explicit-table path on the same scores
    nbrs = np.full((B, N, 16), -1, np.int64)
    for i in range(B):
        nbrs[i, : count[i]] = host_ball_query(
            coord[i, : count[i]], 0.25, 16)
    np.random.seed(9)
    want = pseudo_labeling_batch(
        coord, None, nbrs, count, seed=0, n_jobs=1,
        scores=(msp, ml), **kw)
    np.testing.assert_array_equal(got, want)
