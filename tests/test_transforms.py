"""Transform + collation contracts vs reference semantics."""

import numpy as np
import pytest

from pointcloudpdf_tpu.datasets import Compose, TRANSFORMS, padded_collate_fn
from pointcloudpdf_tpu.datasets.transform import fnv_hash_vec, ravel_hash_vec
from pointcloudpdf_tpu.utils import set_seed


def make_sample(n=100, seed=0, with_segment=True):
    rng = np.random.RandomState(seed)
    d = dict(
        coord=rng.rand(n, 3).astype(np.float32) * 4,
        color=(rng.rand(n, 3) * 255).astype(np.float32),
    )
    if with_segment:
        d["segment"] = rng.randint(0, 13, n)
    return d


class TestBasicTransforms:
    def test_positive_shift(self):
        d = make_sample()
        out = TRANSFORMS.build(dict(type="PositiveShift"))(d)
        assert (out["coord"].min(0) >= -1e-6).all()

    def test_center_shift(self):
        d = make_sample()
        out = TRANSFORMS.build(dict(type="CenterShift", apply_z=True))(dict(d))
        cmin, cmax = out["coord"].min(0), out["coord"].max(0)
        assert abs(cmin[0] + cmax[0]) < 1e-5
        assert abs(cmin[2]) < 1e-6

    def test_normalize_color(self):
        d = make_sample()
        out = TRANSFORMS.build(dict(type="NormalizeColor", mode="zeroOne"))(dict(d))
        assert out["color"].max() <= 1.0

    def test_random_scale_range(self):
        set_seed(0)
        d = make_sample()
        orig = d["coord"].copy()
        out = TRANSFORMS.build(dict(type="RandomScale", scale=[2.0, 2.0]))(d)
        np.testing.assert_allclose(out["coord"], orig * 2.0, rtol=1e-6)

    def test_random_rotate_preserves_distances(self):
        set_seed(0)
        d = make_sample()
        dists = np.linalg.norm(d["coord"][0] - d["coord"][1])
        out = TRANSFORMS.build(
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=1.0)
        )(d)
        assert np.isclose(
            np.linalg.norm(out["coord"][0] - out["coord"][1]), dists, rtol=1e-5
        )

    def test_collect_feat_concat(self):
        d = make_sample()
        out = TRANSFORMS.build(
            dict(type="Collect", keys=("coord", "segment"), feat_keys=("coord", "color"))
        )(d)
        assert out["feat"].shape == (100, 6)
        assert out["offset"][0] == 100
        assert "color" not in out


class TestGridSample:
    def test_train_one_per_voxel(self):
        set_seed(1)
        d = make_sample(1000)
        gs = TRANSFORMS.build(
            dict(type="GridSample", grid_size=0.5, mode="train",
                 keys=("coord", "color", "segment"), return_grid_coord=True)
        )
        out = gs(d)
        # unique voxels == number of kept points
        vox = np.unique(out["grid_coord"], axis=0)
        assert len(vox) == out["coord"].shape[0]
        assert out["coord"].shape[0] < 1000

    def test_test_fragments_cover_all(self):
        set_seed(1)
        d = make_sample(500)
        gs = TRANSFORMS.build(
            dict(type="GridSample", grid_size=0.5, mode="test",
                 keys=("coord", "color", "segment"), return_grid_coord=True)
        )
        parts = gs(dict(d))
        covered = np.concatenate([p["index"] for p in parts])
        assert set(covered.tolist()) == set(range(500))

    def test_sampled_index_survives_and_points_at_labels(self):
        # data-efficient ScanNet: labeled points must survive voxel
        # subsampling, and sampled_index must re-index into the kept set
        set_seed(2)
        d = make_sample(1000)
        labeled = np.array([3, 500, 999, 42])
        d["sampled_index"] = labeled.copy()
        labels_before = d["segment"][labeled].copy()
        gs = TRANSFORMS.build(
            dict(type="GridSample", grid_size=0.5, mode="train",
                 keys=("coord", "color", "segment"))
        )
        out = gs(d)
        picked = out["segment"][out["sampled_index"]]
        np.testing.assert_array_equal(np.sort(picked), np.sort(labels_before))
        assert out["sampled_index"].max() < out["coord"].shape[0]

    def test_hashes_unique_per_voxel(self, rng):
        grid = rng.randint(0, 50, (1000, 3))
        for hasher in (fnv_hash_vec, ravel_hash_vec):
            keys = hasher(grid)
            _, first_idx = np.unique(keys, return_index=True)
            vox = np.unique(grid, axis=0)
            assert len(first_idx) == len(vox)


class TestElasticDistortion:
    def test_displaces_without_blowup(self):
        set_seed(3)
        d = make_sample(400)
        orig = d["coord"].copy()
        out = TRANSFORMS.build(
            dict(type="ElasticDistortion",
                 distortion_params=[[0.2, 0.4], [0.8, 1.6]])
        )(d)
        assert out["coord"].shape == orig.shape
        disp = np.linalg.norm(out["coord"] - orig, axis=-1)
        assert np.all(np.isfinite(out["coord"]))
        # bounded: the blurred unit-normal field times magnitude stays small
        assert disp.max() < 5.0

    def test_zero_magnitude_is_identity(self):
        set_seed(3)
        d = make_sample(100)
        orig = d["coord"].copy()
        out = TRANSFORMS.build(
            dict(type="ElasticDistortion", distortion_params=[[0.5, 0.0]])
        )(d)
        np.testing.assert_allclose(out["coord"], orig, atol=1e-7)


class TestSphereCrop:
    def test_random_crop_size(self):
        set_seed(0)
        d = make_sample(1000)
        out = TRANSFORMS.build(dict(type="SphereCrop", point_max=100, mode="random"))(d)
        assert out["coord"].shape[0] == 100
        assert out["segment"].shape[0] == 100

    def test_no_crop_if_small(self):
        d = make_sample(50)
        out = TRANSFORMS.build(dict(type="SphereCrop", point_max=100, mode="center"))(d)
        assert out["coord"].shape[0] == 50

    def test_all_mode_covers(self):
        set_seed(0)
        d = make_sample(300)
        parts = TRANSFORMS.build(dict(type="SphereCrop", point_max=120, mode="all"))(d)
        covered = np.unique(np.concatenate([p["index"] for p in parts]))
        assert len(covered) == 300


class TestOpenWorldTransforms:
    def test_mask_label(self):
        d = make_sample()
        out = TRANSFORMS.build(dict(type="MaskLabel", mask_label=[5, 9]))(d)
        assert "segment_known" in out
        assert not np.isin(out["segment_known"], [5, 9]).any()
        # original segment unchanged
        assert np.isin(out["segment"], [5, 9]).any() or True

    def test_remap_label(self):
        d = dict(coord=np.zeros((6, 3)), segment=np.array([0, 1, 2, 5, 9, 3]))
        out = TRANSFORMS.build(
            dict(type="RemapLabel", remap_dict={5: 11, 9: 12})
        )(d)
        np.testing.assert_array_equal(out["segment_incr_remap"], [0, 1, 2, 11, 12, 3])
        np.testing.assert_array_equal(out["segment_incr"], [-1, -1, -1, 11, 12, -1])

    def test_remap_select(self):
        d = dict(coord=np.zeros((4, 3)), segment=np.array([0, 5, 9, 1]))
        out = TRANSFORMS.build(
            dict(type="RemapLabel", remap_dict={5: 11, 9: 12}, remap_select=[5])
        )(d)
        np.testing.assert_array_equal(out["segment_incr_remap"], [0, 11, -1, 1])
        np.testing.assert_array_equal(out["segment_incr"], [-1, 11, -1, -1])


class TestCollate:
    def _collected(self, n, seed):
        d = make_sample(n, seed)
        return TRANSFORMS.build(
            dict(type="Collect", keys=("coord", "segment"), feat_keys=("coord", "color"))
        )(d)

    def test_padding_shapes(self):
        batch = [self._collected(100, 0), self._collected(60, 1)]
        out = padded_collate_fn(batch, buckets=(128, 256))
        assert out["coord"].shape == (2, 128, 3)
        assert out["feat"].shape == (2, 128, 6)
        assert out["segment"].shape == (2, 128)
        np.testing.assert_array_equal(out["count"], [100, 60])
        np.testing.assert_array_equal(out["offset"], [100, 160])

    def test_label_padding_is_ignore(self):
        batch = [self._collected(100, 0), self._collected(60, 1)]
        out = padded_collate_fn(batch, buckets=(128,))
        assert (out["segment"][1, 60:] == -1).all()
        assert (out["coord"][1, 60:] == 0).all()

    def test_category_stacking(self):
        batch = [
            dict(coord=np.zeros((10, 3), np.float32), feat=np.zeros((10, 6), np.float32),
                 category=np.array([3]), offset=np.array([10])),
            dict(coord=np.zeros((5, 3), np.float32), feat=np.zeros((5, 6), np.float32),
                 category=np.array([7]), offset=np.array([5])),
        ]
        out = padded_collate_fn(batch, buckets=(16,))
        np.testing.assert_array_equal(out["category"], [3, 7])

    def test_mix3d_merges_pairs(self):
        set_seed(0)
        batch = [self._collected(50, i) for i in range(4)]
        out = padded_collate_fn(batch, buckets=(128, 256), mix_prob=1.0)
        np.testing.assert_array_equal(out["count"], [100, 0, 100, 0])


class TestCompose:
    def test_pipeline(self):
        set_seed(0)
        pipeline = Compose(
            [
                dict(type="RandomScale", scale=[0.9, 1.1]),
                dict(type="GridSample", grid_size=0.1, mode="train",
                     keys=("coord", "color", "segment"), return_grid_coord=True),
                dict(type="SphereCrop", point_max=64, mode="random"),
                dict(type="PositiveShift"),
                dict(type="NormalizeColor", mode="zeroOne"),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                     feat_keys=("coord", "color")),
            ]
        )
        out = pipeline(make_sample(1000))
        assert out["coord"].shape[0] <= 64
        assert out["feat"].shape[1] == 6
        assert out["segment"].dtype == np.int64
