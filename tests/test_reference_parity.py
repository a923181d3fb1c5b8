"""Golden parity against the reference's OWN code, executed on CPU.

The reference (/root/reference, PyTorch) is mostly CUDA-bound, but its
transforms, losses, schedulers and the PDF pseudo-labeling chain are
plain numpy/torch-CPU/scipy/sklearn — so instead of trusting hand-built
inverses, these tests import the reference modules directly (with stubs
for its unavailable CUDA deps) and assert seeded equality:

- transforms: pointcept/datasets/transform.py vs
  pointcloudpdf_tpu/datasets/transform.py under identical np/random
  seeds (same RNG call sequences), including GridSample train picks and
  test fragments;
- LovaszLoss: models/losses/lovasz.py:210 vs ours;
- scheduler curves: utils/scheduler.py:11 vs ours over full runs;
- pseudo-labeling: recognizers/ours/pointpdf_v1m1_base.py:187-382 vs
  recognizers/pseudo_label.py on identical inputs with pinned dice.
"""

import copy
import os
import random
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


def _stub_missing():
    """Stub the reference's CUDA/native deps so its CPU modules import."""
    if "addict" not in sys.modules:
        m = types.ModuleType("addict")

        class Dict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        m.Dict = Dict
        sys.modules["addict"] = m
    for name in (
        "SharedArray", "torch_points_kernels", "spconv", "spconv.pytorch",
        "torch_scatter", "torch_geometric", "torch_geometric.nn",
        "torch_geometric.nn.pool", "torch_geometric.utils", "open3d",
        "pointops", "pointops2", "pointgroup_ops", "ocnn",
        "MinkowskiEngine", "torchsparse", "flash_attn", "timm",
        "timm.models", "timm.models.layers", "torch_points3d",
        "torch_points3d.modules", "torch_points3d.modules.KPConv",
        "torch_points3d.modules.KPConv.kernels", "torch_points3d.core",
        "torch_points3d.core.common_modules",
    ):
        if name in sys.modules:
            continue
        m = types.ModuleType(name)

        def _getattr(attr, _n=name):
            if attr.startswith("__"):
                raise AttributeError(attr)
            return types.SimpleNamespace()

        m.__getattr__ = _getattr
        sys.modules[name] = m


@pytest.fixture(scope="module")
def ref():
    import torch  # noqa: F401  (import the real deps before stubbing)

    _stub_missing()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import pointcept.datasets.transform as ref_transform
    import pointcept.models.losses.lovasz as ref_lovasz
    import pointcept.recognizers.ours.pointpdf_v1m1_base as ref_pdf
    import pointcept.utils.scheduler as ref_scheduler

    return types.SimpleNamespace(
        transform=ref_transform, lovasz=ref_lovasz, scheduler=ref_scheduler,
        pdf=ref_pdf)


def _to_np(x):
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _make_data(rng, n=257):
    coord = (rng.rand(n, 3) * 4.0 - 1.0).astype(np.float32)
    return dict(
        coord=coord,
        color=(rng.rand(n, 3) * 255.0).astype(np.float32),
        normal=(lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
            rng.randn(n, 3).astype(np.float32)),
        segment=rng.randint(0, 13, n).astype(np.int64),
    )


# name, kwargs, seeded (needs identical RNG call sequence)
TRANSFORM_CASES = [
    ("NormalizeCoord", {}, False),
    ("PositiveShift", {}, False),
    ("CenterShift", dict(apply_z=True), False),
    ("CenterShift", dict(apply_z=False), False),
    ("NormalizeColor", {}, False),
    ("PointClip", dict(point_cloud_range=(-1, -1, -1, 2, 2, 2)), False),
    ("RandomShift", dict(shift=((-0.2, 0.2), (-0.2, 0.2), (-0.1, 0.1))),
     True),
    ("RandomDropout", dict(dropout_ratio=0.2, dropout_application_ratio=1.0),
     True),
    ("RandomRotate", dict(angle=(-1, 1), axis="z", p=1.0), True),
    ("RandomRotate", dict(angle=(-1, 1), axis="x", center=(0.5, 0.5, 0.5),
                          p=1.0), True),
    ("RandomRotateTargetAngle", dict(angle=(0.5, 1.0, 1.5), axis="z", p=1.0),
     True),
    ("RandomScale", dict(scale=(0.8, 1.2), anisotropic=True), True),
    ("RandomScale", dict(scale=(0.8, 1.2)), True),
    ("RandomFlip", dict(p=0.5), True),
    ("RandomJitter", dict(sigma=0.01, clip=0.02), True),
    ("ChromaticAutoContrast", dict(p=1.0, blend_factor=None), True),
    ("ChromaticTranslation", dict(p=1.0, ratio=0.1), True),
    ("ChromaticJitter", dict(p=1.0, std=0.05), True),
    ("HueSaturationTranslation", dict(hue_max=0.2, saturation_max=0.2),
     True),
    ("RandomColorGrayScale", dict(p=1.0), True),
    ("RandomColorDrop", dict(p=1.0, color_augment=0.0), True),
    ("ElasticDistortion", dict(distortion_params=[[0.2, 0.4]]), True),
    ("GridSample", dict(grid_size=0.12, hash_type="fnv", mode="train",
                        keys=("coord", "color", "normal", "segment"),
                        return_grid_coord=True), True),
    ("GridSample", dict(grid_size=0.12, hash_type="ravel", mode="train",
                        keys=("coord", "color", "normal", "segment")), True),
    ("ShufflePoint", {}, True),
    ("SphereCrop", dict(point_max=128, mode="random"), True),
    ("SphereCrop", dict(point_max=128, mode="center"), True),
    ("MaskLabel", dict(mask_label=(2, 5), mask_to=-1), False),
    ("RemapLabel", dict(remap_dict={2: 0, 5: 1}), False),
    ("RemapLabel", dict(remap_dict={2: 0, 5: 1}, remap_select=[2]), False),
]
# NOT testable against the reference: ClipGaussianJitter — the reference
# initializes ``self.mean = np.mean(3)`` (a scalar, transform.py:360),
# which modern numpy's multivariate_normal rejects ("mean must be 1
# dimensional"), so the reference transform itself crashes when invoked;
# ours uses the evident intent (zero mean) and is covered by unit tests.


@pytest.fixture()
def no_native(monkeypatch):
    """Force the numpy GridSample path: the native voxel hash produces a
    different (valid) intra-voxel ORDER than the reference's np.argsort;
    exact seeded equality holds on the numpy path, voxel-equivalence of
    the native path is asserted separately below."""
    from pointcloudpdf_tpu import native

    monkeypatch.setattr(native, "available", lambda: False)


@pytest.mark.parametrize("name,kwargs,seeded",
                         TRANSFORM_CASES,
                         ids=[f"{n}-{i}" for i, (n, _, _) in
                              enumerate(TRANSFORM_CASES)])
def test_transform_parity(ref, no_native, name, kwargs, seeded):
    from pointcloudpdf_tpu.datasets import transform as our_transform

    rng = np.random.RandomState(11)
    data = _make_data(rng)

    ref_t = ref.transform.TRANSFORMS.build(dict(type=name, **kwargs))
    our_t = our_transform.TRANSFORMS.build(dict(type=name, **kwargs))

    np.random.seed(123)
    random.seed(123)
    ref_out = ref_t(copy.deepcopy(data))
    np.random.seed(123)
    random.seed(123)
    our_out = our_t(copy.deepcopy(data))

    def compare(a, b, where):
        keys = set(a) & set(b) & {
            "coord", "color", "normal", "segment", "grid_coord", "index",
            "segment_known", "segment_incr", "segment_incr_remap", "oracle"}
        assert keys, (where, set(a), set(b))
        for k in sorted(keys):
            np.testing.assert_allclose(
                _to_np(b[k]).astype(np.float64),
                _to_np(a[k]).astype(np.float64),
                rtol=1e-6, atol=1e-6, err_msg=f"{where}:{k}")

    compare(ref_out, our_out, name)


def test_gridsample_test_fragments_parity(ref, no_native):
    """GridSample(mode=test): the complementary fragments must enumerate
    the same index sets in the same order (reference transform.py:859-887)."""
    from pointcloudpdf_tpu.datasets import transform as our_transform

    data = _make_data(np.random.RandomState(5), n=400)
    kwargs = dict(grid_size=0.25, hash_type="fnv", mode="test",
                  keys=("coord", "color", "normal", "segment"),
                  return_grid_coord=True)
    ref_frags = ref.transform.TRANSFORMS.build(
        dict(type="GridSample", **kwargs))(copy.deepcopy(data))
    our_frags = our_transform.TRANSFORMS.build(
        dict(type="GridSample", **kwargs))(copy.deepcopy(data))
    assert len(ref_frags) == len(our_frags) > 1
    for i, (rf, of) in enumerate(zip(ref_frags, our_frags)):
        np.testing.assert_array_equal(
            _to_np(of["index"]), _to_np(rf["index"]), err_msg=f"frag{i}")
        np.testing.assert_allclose(
            _to_np(of["coord"]), _to_np(rf["coord"]), rtol=1e-6,
            err_msg=f"frag{i}")


def test_gridsample_native_voxel_equivalent(ref):
    """The native-hash production path orders points differently (its
    O(N) table vs the reference's np.argsort) but must be VOXEL
    equivalent: same fragment count, every fragment holds exactly one
    point per occupied voxel, and the fragments' union covers all
    points.  Downstream consumers are order-invariant (the tester
    scatters by the carried ``index``)."""
    from pointcloudpdf_tpu import native
    from pointcloudpdf_tpu.datasets import transform as our_transform

    if not native.available():
        pytest.skip("native voxel hash not built")
    data = _make_data(np.random.RandomState(5), n=400)
    kwargs = dict(grid_size=0.25, hash_type="fnv", mode="test",
                  keys=("coord", "color", "normal", "segment"),
                  return_grid_coord=True)
    ref_frags = ref.transform.TRANSFORMS.build(
        dict(type="GridSample", **kwargs))(copy.deepcopy(data))
    our_frags = our_transform.TRANSFORMS.build(
        dict(type="GridSample", **kwargs))(copy.deepcopy(data))
    assert len(ref_frags) == len(our_frags)

    grid_all = np.floor(data["coord"] / 0.25).astype(np.int64)
    grid_all -= grid_all.min(0)
    vox_ids = {tuple(g) for g in grid_all}
    covered = np.zeros(len(data["coord"]), bool)
    for i, of in enumerate(our_frags):
        got = {tuple(g) for g in np.asarray(of["grid_coord"])}
        # one representative per occupied voxel, possibly repeating
        # voxels whose count < fragment index (complementary scheme)
        assert got == vox_ids, f"frag{i} voxel set mismatch"
        assert len(of["index"]) == len(vox_ids)
        covered[np.asarray(of["index"])] = True
    assert covered.all(), "fragments do not cover every point"


def test_lovasz_parity(ref):
    import jax.numpy as jnp
    import torch

    from pointcloudpdf_tpu.models.losses import build_criteria

    rng = np.random.RandomState(7)
    logits = rng.randn(500, 13).astype(np.float32) * 2.0
    target = rng.randint(0, 13, 500).astype(np.int64)
    target[rng.rand(500) < 0.1] = -1

    ref_loss = ref.lovasz.LovaszLoss(mode="multiclass", ignore_index=-1,
                                     loss_weight=1.0)
    want = float(ref_loss(torch.from_numpy(logits),
                          torch.from_numpy(target)))

    ours = build_criteria([dict(type="LovaszLoss", mode="multiclass",
                                ignore_index=-1, loss_weight=1.0)])
    got = float(ours(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


SCHED_CASES = [
    ("MultiStepLR", dict(milestones=[0.6, 0.8], gamma=0.1)),
    ("MultiStepWithWarmupLR", dict(milestones=[0.6, 0.8], gamma=0.1,
                                   warmup_rate=0.05, warmup_scale=1e-6)),
    ("PolyLR", dict(power=0.9)),
    ("ExpLR", dict(gamma=0.9)),
    ("CosineAnnealingLR", dict(eta_min=0.001)),
    ("OneCycleLR", dict(max_lr=0.01, pct_start=0.3, anneal_strategy="cos",
                        div_factor=10.0, final_div_factor=100.0)),
]


@pytest.mark.parametrize("name,kwargs", SCHED_CASES,
                         ids=[c[0] for c in SCHED_CASES])
def test_scheduler_curve_parity(ref, name, kwargs, monkeypatch):
    import torch
    import torch.optim.lr_scheduler as tls

    from pointcloudpdf_tpu.utils.scheduler import build_scheduler

    # torch >= 2.7 removed the deprecated ``verbose`` kwarg the reference
    # still passes (utils/scheduler.py); shim it so the reference's own
    # classes construct unmodified
    for cls in (tls.LambdaLR, tls.MultiStepLR, tls.CosineAnnealingLR,
                tls.OneCycleLR):
        orig = cls.__init__

        def make(orig):
            def init(self, *a, verbose=None, **kw):
                return orig(self, *a, **kw)

            return init

        monkeypatch.setattr(cls, "__init__", make(orig))

    total = 100
    base_lr = 0.02
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    ref_sched = ref.scheduler.SCHEDULERS.build(
        dict(type=name, optimizer=opt, total_steps=total, **kwargs))
    want = []
    for s in range(total):
        want.append(opt.param_groups[0]["lr"])
        opt.step()
        ref_sched.step()

    ours = build_scheduler(dict(type=name, **kwargs), base_lr=base_lr,
                           total_steps=total)
    got = [float(ours(s)) for s in range(total)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9,
                               err_msg=name)


def test_pseudo_labeling_parity(ref):
    """The full pseudo-labeling chain (region growth -> MST -> GMM edge
    filter -> CC size filter) against the reference staticmethod on
    identical inputs.  Randomness pinned: the seed dice are forced to the
    same array on both sides, and np.random is seeded so sklearn's GMM
    kmeans init draws identically."""
    import torch

    from pointcloudpdf_tpu.recognizers.pseudo_label import pseudo_labeling

    rng = np.random.RandomState(42)
    n, k_cls, k_nn = 900, 10, 12
    coord = rng.rand(n, 3).astype(np.float32) * 3.0
    logits = rng.randn(n, k_cls).astype(np.float32) * 3.0
    # a spatial blob of low-confidence points (near-uniform logits)
    blob = np.linalg.norm(coord - coord[0], axis=1) < 0.8
    logits[blob] = rng.randn(blob.sum(), k_cls).astype(np.float32) * 0.05

    # kNN table with ~20% -1 slots (the reference's variable-length ball
    # lists pad with -1)
    d2 = ((coord[None] - coord[:, None]) ** 2).sum(-1)
    nn_idx = np.argsort(d2, axis=1)[:, :k_nn].astype(np.int64)
    drop = rng.rand(n, k_nn) < 0.2
    drop[:, :4] = False
    neighbors = np.where(drop, -1, nn_idx)

    params = dict(condition_from="msp", beta=1.5, seed_from="ml",
                  seed_range=0.15, num_seed=40, slide_window=True)
    dice = rng.randint(0, int(params["seed_range"] * n), 40)

    cls = None
    for attr in dir(ref.pdf):
        obj = getattr(ref.pdf, attr)
        if hasattr(obj, "pseudo_labeling"):
            cls = obj
            break
    assert cls is not None

    orig_randint = torch.randint
    torch.randint = lambda lo, hi, size, **kw: torch.from_numpy(
        np.minimum(dice[: size[0]], hi - 1))
    try:
        np.random.seed(99)
        want = cls.pseudo_labeling(
            torch.from_numpy(coord), torch.from_numpy(logits),
            torch.from_numpy(neighbors), **params)
    finally:
        torch.randint = orig_randint
    want = _to_np(want).astype(bool)

    class _FixedRng:
        def randint(self, lo, hi, size=None):
            return np.minimum(dice[:size], hi - 1)

    np.random.seed(99)
    got = pseudo_labeling(coord, logits, neighbors, rng=_FixedRng(),
                          **params)

    assert want.any(), "degenerate case: reference flagged nothing"
    np.testing.assert_array_equal(got, want)
