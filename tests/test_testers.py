"""Tester stack e2e: fragment voting + caching through SemSegTester.

Drives the full test protocol (TTA aug x complementary voxel fragments
-> bucketed padded forwards -> host softmax vote -> per-scene metrics ->
npy cache reuse) on synthetic scenes with an init-only checkpoint.
"""

import os

import numpy as np
import pytest

from pointcloudpdf_tpu.utils.config import Config


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.RandomState(0)
    os.makedirs(root / "test", exist_ok=True)
    for s in range(2):
        n = rng.randint(300, 400)
        coord = rng.rand(n, 3).astype(np.float32) * 2
        color = (rng.rand(n, 3) * 255).astype(np.float32)
        seg = ((coord[:, 0] > 1) * 2 + (coord[:, 1] > 1)).astype(np.int64)
        np.savez(root / "test" / f"scene{s}.npz",
                 coord=coord, color=color, semantic_gt=seg)
    return str(root)


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import functools

    import jax

    from pointcloudpdf_tpu.models import build_model
    from pointcloudpdf_tpu.utils.checkpoint import save_checkpoint, to_host

    model = build_model(
        dict(
            type="DefaultSegmentor",
            backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                          num_classes=4),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                           ignore_index=-1)],
        )
    )
    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    batch = dict(
        coord=jnp.asarray(rng.rand(1, 256, 3).astype(np.float32)),
        feat=jnp.asarray(rng.rand(1, 256, 6).astype(np.float32)),
        mask=jnp.ones((1, 256), bool),
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch
    )
    path = str(tmp_path_factory.mktemp("ckpt") / "model.pth")
    save_checkpoint(
        path,
        dict(epoch=1, state=to_host(
            dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {}))
        )),
    )
    return path


def test_semseg_tester_fragments_and_cache(scene_root, checkpoint, tmp_path):
    from pointcloudpdf_tpu.engines.test import TESTERS

    cfg = Config(
        dict(
            save_path=str(tmp_path / "exp"),
            weight=checkpoint,
            batch_size_test=1,
            model=dict(
                type="DefaultSegmentor",
                backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                              num_classes=4),
                criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                               ignore_index=-1)],
            ),
            data=dict(
                num_classes=4,
                ignore_index=-1,
                names=["a", "b", "c", "d"],
                test=dict(
                    type="DefaultDataset",
                    split="test",
                    data_root=scene_root,
                    transform=[dict(type="NormalizeColor")],
                    test_mode=True,
                    test_cfg=dict(
                        voxelize=dict(type="GridSample", grid_size=0.1,
                                      hash_type="fnv", mode="test",
                                      keys=("coord", "color")),
                        crop=None,
                        post_transform=[
                            dict(type="ToTensor"),
                            dict(type="Collect", keys=("coord", "index"),
                                 feat_keys=("coord", "color")),
                        ],
                        aug_transform=[
                            [dict(type="RandomScale", scale=[1, 1])]
                        ],
                    ),
                ),
            ),
        )
    )
    os.makedirs(cfg.save_path, exist_ok=True)
    tester = TESTERS.build(dict(type="SemSegTester", cfg=cfg))
    tester.test()
    result_dir = os.path.join(cfg.save_path, "result")
    preds = sorted(os.listdir(result_dir))
    assert "scene0_pred.npy" in preds and "scene1_pred.npy" in preds
    pred0 = np.load(os.path.join(result_dir, "scene0_pred.npy"))
    # every original point got a vote (fragments are complementary)
    scene0 = np.load(os.path.join(scene_root, "test", "scene0.npz"))
    assert pred0.shape[0] == scene0["coord"].shape[0]
    assert set(np.unique(pred0)).issubset({0, 1, 2, 3})

    # second run must reuse the caches (no recompute of fragments)
    mtime = os.path.getmtime(os.path.join(result_dir, "scene0_pred.npy"))
    tester2 = TESTERS.build(dict(type="SemSegTester", cfg=cfg))
    tester2.test()
    assert os.path.getmtime(
        os.path.join(result_dir, "scene0_pred.npy")
    ) == mtime
