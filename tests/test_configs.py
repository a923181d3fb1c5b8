"""Config corpus smoke test: every shipped config must parse, its model
must build, its transforms must resolve, and its trainer/tester/hook/
optimizer/scheduler types must exist in their registries.

The reference treats configs as the public API (111 files); this guards
the whole corpus against registry drift without paying a jit compile per
file (model construction in flax is lazy — parameters materialise only
at init, which dedicated model tests cover).
"""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                         recursive=True)
    if "_base_" not in os.path.basename(os.path.dirname(p))
)


def _ids(path):
    return os.path.relpath(path, os.path.join(REPO, "configs"))


@pytest.mark.parametrize("path", CONFIGS, ids=_ids)
def test_config_parses_and_builds(path, tmp_path, monkeypatch):
    monkeypatch.chdir(REPO)
    from pointcloudpdf_tpu.datasets import TRANSFORMS
    from pointcloudpdf_tpu.engines.defaults import default_config_parser
    from pointcloudpdf_tpu.engines.hooks import HOOKS
    from pointcloudpdf_tpu.engines.test import TESTERS
    from pointcloudpdf_tpu.engines.train import TRAINERS
    from pointcloudpdf_tpu.models import build_model
    from pointcloudpdf_tpu.utils.optimizer import OPTIMIZERS
    from pointcloudpdf_tpu.utils.scheduler import SCHEDULERS

    cfg = default_config_parser(
        path, options=dict(save_path=str(tmp_path), seed=0)
    )

    # model (and nested recognizer / incremental learner) constructs
    model = build_model(dict(cfg.model))
    assert model is not None
    if cfg.get("recognizer"):
        from pointcloudpdf_tpu.recognizers import build_recognizer

        assert build_recognizer(dict(cfg.recognizer)) is not None
    if cfg.get("incremental_learner"):
        from pointcloudpdf_tpu.incr_learners import build_incremental_learner

        assert build_incremental_learner(
            dict(cfg.incremental_learner)
        ) is not None

    # every transform name in every pipeline resolves
    def check_transforms(tr_list):
        for t in tr_list or []:
            assert t["type"] in TRANSFORMS, t["type"]

    def walk_dataset(ds):
        if ds is None:
            return
        if ds.get("type") == "ConcatDataset":
            for sub in ds["datasets"]:
                walk_dataset(sub)
            return
        check_transforms(ds.get("transform"))
        tc = ds.get("test_cfg") or {}
        if tc.get("voxelize"):
            assert tc["voxelize"]["type"] in TRANSFORMS
        check_transforms(tc.get("post_transform"))
        for aug in tc.get("aug_transform") or []:
            check_transforms(aug)

    for split in ("train", "val", "test"):
        walk_dataset(cfg.data.get(split))

    # runtime types resolve
    assert cfg.train["type"] in TRAINERS, cfg.train["type"]
    if cfg.get("test"):
        assert cfg.test["type"] in TESTERS, cfg.test["type"]
    for hook in cfg.get("hooks") or []:
        assert hook["type"] in HOOKS, hook["type"]
    if cfg.get("optimizer"):
        assert cfg.optimizer["type"] in OPTIMIZERS, cfg.optimizer["type"]
    if cfg.get("scheduler"):
        assert cfg.scheduler["type"] in SCHEDULERS, cfg.scheduler["type"]
