"""Native C++ voxel-hash core vs the numpy reference path."""

import numpy as np
import pytest

from pointcloudpdf_tpu import native
from pointcloudpdf_tpu.datasets.transform import fnv_hash_vec


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_fnv_hash_matches_numpy(built, rng):
    grid = rng.randint(0, 300, (5000, 3)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(native.fnv_hash(grid)), fnv_hash_vec(grid).astype(np.uint64)
    )


def test_voxel_unique_grouping(built, rng):
    grid = rng.randint(0, 10, (2000, 3)).astype(np.int32)
    keys = native.fnv_hash(grid)
    order, inverse, counts, starts = native.voxel_unique(keys)
    u, inv_np, c_np = np.unique(keys, return_inverse=True, return_counts=True)
    assert len(counts) == len(u)
    assert sorted(counts.tolist()) == sorted(c_np.tolist())
    assert counts.sum() == len(grid)
    # same-voxel iff same key
    for a, b in [(0, 1), (10, 11), (100, 500)]:
        assert (inverse[a] == inverse[b]) == (keys[a] == keys[b])
    # order groups points contiguously by voxel id, CSR starts consistent
    gathered = inverse[order]
    assert (np.diff(gathered) >= 0).all()
    np.testing.assert_array_equal(np.diff(starts), counts)
    # every voxel's members share one key
    for v in range(0, len(counts), max(len(counts) // 7, 1)):
        members = order[starts[v]:starts[v + 1]]
        assert len(set(keys[members].tolist())) == 1


def test_gridsample_native_vs_numpy_equivalent(built, rng):
    from pointcloudpdf_tpu.datasets.transform import GridSample

    coord = rng.rand(3000, 3).astype(np.float32) * 3
    seg = rng.randint(0, 5, 3000).astype(np.int64)
    gs = GridSample(grid_size=0.1, hash_type="fnv", mode="train",
                    keys=("coord", "segment"), return_grid_coord=True)
    out = gs(dict(coord=coord.copy(), segment=seg.copy()))
    # one representative per voxel, grid coords consistent with coords
    g = np.floor(out["coord"] / 0.1).astype(int)
    g = g - g.min(0)
    kept = fnv_hash_vec(out["grid_coord"])
    assert len(np.unique(kept)) == len(kept)  # one point per voxel
