"""Testers: precise full-scene inference via complementary voxel fragments.

Fresh TPU-native re-design of the reference tester stack
(pointcept/engines/test.py:42-1291).  Key differences from the CUDA
reference:

- fragments are padded to bucketed static capacities so each distinct
  bucket compiles once and every later fragment reuses the executable;
- the softmax vote / score scatter-mean back to full resolution happens
  host-side in numpy (it is O(N) bookkeeping, not compute);
- scenes are sharded across processes by index stride rather than a
  DistributedSampler, with the same host object-gather for final metrics.

Per-scene ``{name}_pred.npy`` caching, submit writers, and metric
definitions match the reference (test.py:189-443).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..datasets import build_dataset
from ..datasets.utils import padded_collate_fn
from ..models import build_model
from ..utils import comm
from ..utils.checkpoint import load_checkpoint, load_weights_into
from ..utils.events import AverageMeter
from ..utils.logger import get_root_logger
from ..utils.misc import (
    aupr_and_auroc,
    intersection_and_union_np,
    make_dirs,
    selected_mask,
)
from ..utils.registry import Registry

TESTERS = Registry("testers")


class TesterBase:
    """Owns the model + weights + test dataset; subclasses drive scenes.

    Reference contract: pointcept/engines/test.py:45-122.
    """

    def __init__(self, cfg, model=None, test_loader=None, verbose=False):
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "test.log") if cfg.save_path else None,
        )
        self.logger.info("=> Loading config ...")
        self.cfg = cfg
        self.verbose = verbose
        self.model = model if model is not None else self.build_model()
        self.test_dataset = (
            test_loader if test_loader is not None else self.build_test_dataset()
        )
        self.params = None
        self.batch_stats = None
        self._checkpoint = None
        self._forward = None

    # -- building ------------------------------------------------------------
    def build_model(self):
        self.logger.info("=> Building model ...")
        return build_model(dict(self.cfg.model))

    def build_test_dataset(self):
        self.logger.info("=> Building test dataset ...")
        return build_dataset(dict(self.cfg.data.test))

    def load_checkpoint_payload(self) -> Dict:
        if self._checkpoint is None:
            weight = self.cfg.get("weight")
            if not weight or not os.path.isfile(weight):
                raise RuntimeError(f"=> No checkpoint found at '{weight}'")
            self.logger.info(f"Loading weight at: {weight}")
            self._checkpoint = load_checkpoint(weight)
            self.logger.info(
                f"=> Loaded weight '{weight}' "
                f"(epoch {self._checkpoint.get('epoch')})"
            )
        return self._checkpoint

    def checkpoint_model_state(self):
        """(params, batch_stats) for the segmentor from either a closed-set
        or an open-set (joint {model, recognizer}) checkpoint."""
        state = self.load_checkpoint_payload()["state"]
        params = state["params"]
        stats = state.get("batch_stats", {})
        if isinstance(params, dict) and "model" in params and "recognizer" in params:
            return params["model"], stats.get("model", {})
        return params, stats

    def init_state(self, example_batch: Dict):
        import functools

        # jitted init: eager flax init is orders of magnitude slower
        variables = jax.jit(functools.partial(self.model.init, train=False))(
            {"params": jax.random.PRNGKey(0)}, example_batch
        )
        ck_params, ck_stats = self.checkpoint_model_state()
        merged = load_weights_into(
            {"params": jax.device_get(variables["params"]),
             "batch_stats": jax.device_get(variables.get("batch_stats", {}))},
            {"params": ck_params, "batch_stats": ck_stats},
        )
        self.params, self.batch_stats = merged["params"], merged["batch_stats"]

    def device_batch(self, collated: Dict) -> Dict:
        batch = {
            k: jnp.asarray(v)
            for k, v in collated.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        if "count" in batch:
            n_pad = batch["coord"].shape[1]
            batch["mask"] = jnp.arange(n_pad)[None, :] < batch["count"][:, None]
        return batch

    def make_forward(self):
        model = self.model

        @jax.jit
        def forward(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=False,
            )
            return out

        return forward

    def forward_fragment(self, fragment: Dict) -> Dict:
        """Pad one fragment to its bucket, run the jitted forward, return
        host-side arrays trimmed to the valid point count."""
        collated = padded_collate_fn(
            [fragment], ignore_index=self.cfg.data.get("ignore_index", -1)
        )
        batch = self.device_batch(collated)
        if self.params is None:
            self.init_state(batch)
            self._forward = self.make_forward()
        out = self._forward(self.params, self.batch_stats, batch)
        n = int(collated["count"][0])
        return {
            k: np.asarray(jax.device_get(v))[0, :n]
            for k, v in out.items()
            if hasattr(v, "ndim") and v.ndim >= 2
        }

    def write_submit(self, save_path, data_name, pred):
        """Per-dataset benchmark submission writers
        (reference test.py:320-381)."""
        ds_type = self.cfg.data.test.type
        if ds_type in ("ScanNetDataset", "ScanNet200Dataset"):
            submit_dir = make_dirs(os.path.join(save_path, "submit"))
            np.savetxt(
                os.path.join(submit_dir, f"{data_name}.txt"),
                self.test_dataset.class2id[pred].reshape(-1, 1),
                fmt="%d",
            )
        elif ds_type == "SemanticKITTIDataset":
            sequence_name, frame_name = data_name.split("_")
            submit_dir = make_dirs(os.path.join(
                save_path, "submit", "sequences", sequence_name, "predictions"
            ))
            inv = self.test_dataset.learning_map_inv
            raw = np.vectorize(inv.__getitem__)(pred.astype(np.int64))
            raw.astype(np.uint32).tofile(
                os.path.join(submit_dir, f"{frame_name}.label")
            )
        elif ds_type == "NuScenesDataset":
            submit_dir = make_dirs(os.path.join(
                save_path, "submit", "lidarseg", "test"
            ))
            (pred + 1).astype(np.uint8).tofile(
                os.path.join(submit_dir, f"{data_name}_lidarseg.bin")
            )

    def scene_indices(self):
        return range(comm.get_rank(), len(self.test_dataset), comm.get_world_size())

    def test(self):
        raise NotImplementedError


@TESTERS.register_module()
class SemSegTester(TesterBase):
    """Closed-set fragment-voting semantic segmentation tester
    (reference test.py:897-1118)."""

    def test(self):
        logger = self.logger
        cfg = self.cfg
        num_classes = cfg.data.num_classes
        ignore_index = cfg.data.get("ignore_index", -1)
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        batch_time = AverageMeter()
        save_path = make_dirs(os.path.join(cfg.save_path, "result"))
        record = {}

        for idx in self.scene_indices():
            end = time.time()
            data_dict = self.test_dataset[idx]
            fragment_list = data_dict.pop("fragment_list")
            segment = np.asarray(data_dict.pop("segment")).reshape(-1)
            data_name = data_dict.pop("name")
            pred_save_path = os.path.join(save_path, f"{data_name}_pred.npy")
            if os.path.isfile(pred_save_path):
                logger.info(f"{idx + 1}/{len(self.test_dataset)}: {data_name}, "
                            "loaded pred.")
                pred = np.load(pred_save_path)
            else:
                vote = np.zeros((segment.size, num_classes), np.float32)
                for i, fragment in enumerate(fragment_list):
                    index = np.asarray(fragment["index"]).reshape(-1)
                    out = self.forward_fragment(fragment)
                    probs = _softmax_np(out["seg_logits"])
                    np.add.at(vote, index, probs)
                    logger.info(
                        f"Test: {idx + 1}/{len(self.test_dataset)}-{data_name}, "
                        f"Batch: {i}/{len(fragment_list)}"
                    )
                pred = vote.argmax(-1)
                np.save(pred_save_path, pred)
            if "origin_segment" in data_dict:
                assert "inverse" in data_dict
                pred = pred[data_dict["inverse"]]
                segment = np.asarray(data_dict["origin_segment"]).reshape(-1)
            inter, union, target = intersection_and_union_np(
                pred, segment, num_classes, ignore_index
            )
            record[data_name] = dict(intersection=inter, union=union, target=target)
            batch_time.update(time.time() - end)
            mask = union != 0
            iou = np.mean((inter / np.maximum(union, 1e-10))[mask])
            acc = inter.sum() / max(target.sum(), 1e-10)
            logger.info(
                f"Test: {data_name} [{idx + 1}/{len(self.test_dataset)}]-"
                f"{segment.size} Batch {batch_time.val:.3f} "
                f"({batch_time.avg:.3f}) Accuracy {acc:.4f} mIoU {iou:.4f}"
            )
            self.write_submit(save_path, data_name, pred)

        logger.info("Syncing ...")
        gathered = comm.gather(record, dst=0)
        if comm.is_main_process():
            record = {k: v for r in gathered for k, v in r.items()}
            self.finalize(record, save_path)

    def finalize(self, record, save_path):
        cfg = self.cfg
        inter = np.sum([m["intersection"] for m in record.values()], axis=0)
        union = np.sum([m["union"] for m in record.values()], axis=0)
        target = np.sum([m["target"] for m in record.values()], axis=0)
        if cfg.data.test.type == "S3DISDataset":
            # 6-fold record consumed by tools/test_s3dis_6fold.py
            import pickle

            with open(os.path.join(
                save_path, f"{self.test_dataset.split}.pickle"
            ), "wb") as f:
                pickle.dump(
                    dict(intersection=inter, union=union, target=target), f
                )
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter.sum() / max(target.sum(), 1e-10))
        self.logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        for c in range(cfg.data.num_classes):
            self.logger.info(
                f"Class_{c} - {cfg.data.names[c]} Result: iou/accuracy "
                f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        self.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


@TESTERS.register_module()
class OpenSegTester(TesterBase):
    """Open-set fragment tester: softmax vote + recognizer score
    scatter-mean, known-masked mIoU, global AUPR/AUROC
    (reference test.py:125-509)."""

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        from ..recognizers import build_recognizer

        self.recognizer = build_recognizer(cfg.recognizer)
        self.rec_params = None
        self.rec_stats = None
        self.mask_known = ~selected_mask(cfg.unknown_label, cfg.data.num_classes)

    def init_state(self, example_batch: Dict):
        import functools

        super().init_state(example_batch)
        if getattr(self.recognizer, "has_params", False):
            out = jax.jit(functools.partial(self.model.apply, train=False))(
                {"params": self.params, "batch_stats": self.batch_stats},
                example_batch,
            )
            rec_vars = jax.jit(
                functools.partial(self.recognizer.model.init, train=False)
            )({"params": jax.random.PRNGKey(0)}, out["intermediates"])
            state = self.load_checkpoint_payload()["state"]
            ck_params = state["params"].get("recognizer", {})
            ck_stats = state.get("batch_stats", {}).get("recognizer", {})
            merged = load_weights_into(
                {"params": jax.device_get(rec_vars["params"]),
                 "batch_stats": jax.device_get(rec_vars.get("batch_stats", {}))},
                {"params": ck_params, "batch_stats": ck_stats},
            )
            self.rec_params = merged["params"]
            self.rec_stats = merged["batch_stats"]

    def make_forward(self):
        model = self.model
        rec = self.recognizer
        rec_module = rec.model if getattr(rec, "has_params", False) else None

        @jax.jit
        def forward(params, batch_stats, batch, rec_params, rec_stats):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=False,
            )
            seg_logits = out["seg_logits"]
            if rec_module is not None:
                rec_raw = rec_module.apply(
                    {"params": rec_params, "batch_stats": rec_stats},
                    out["intermediates"], train=False,
                )
                score = rec.score(seg_logits, rec_raw)
            else:
                score = rec.score(seg_logits)
            return {"seg_logits": seg_logits, "score": score}

        return lambda p, b, batch: forward(
            p, b, batch, self.rec_params, self.rec_stats
        )

    def test(self):
        logger = self.logger
        cfg = self.cfg
        num_classes = cfg.data.num_classes
        ignore_index = cfg.data.get("ignore_index", -1)
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        batch_time = AverageMeter()
        aupr_meter, auroc_meter = AverageMeter(), AverageMeter()
        save_path = make_dirs(os.path.join(cfg.save_path, "result"))
        if cfg.data.test.type in ("ScanNetDataset", "ScanNet200Dataset") and (
            comm.is_main_process()
        ):
            make_dirs(os.path.join(save_path, "submit"))
        record = {}

        for idx in self.scene_indices():
            end = time.time()
            data_dict = self.test_dataset[idx]
            fragment_list = data_dict.pop("fragment_list")
            segment = np.asarray(data_dict.pop("segment")).reshape(-1)
            data_name = data_dict.pop("name")
            pred_save_path = os.path.join(save_path, f"{data_name}_pred.npy")
            score_save_path = os.path.join(save_path, f"{data_name}_score.npy")
            if os.path.isfile(pred_save_path) and os.path.isfile(score_save_path):
                logger.info(
                    f"{idx + 1}/{len(self.test_dataset)}: {data_name}, "
                    "loaded pred and score."
                )
                pred = np.load(pred_save_path)
                score = np.load(score_save_path)
            else:
                vote = np.zeros((segment.size, num_classes), np.float32)
                score_sum = np.zeros((segment.size,), np.float64)
                score_cnt = np.zeros((segment.size,), np.int64)
                for i, fragment in enumerate(fragment_list):
                    index = np.asarray(fragment["index"]).reshape(-1)
                    out = self.forward_fragment(fragment)
                    probs = _softmax_np(out["seg_logits"])
                    np.add.at(vote, index, probs)
                    np.add.at(score_sum, index, out["score"].astype(np.float64))
                    np.add.at(score_cnt, index, 1)
                    logger.info(
                        f"Test: {idx + 1}/{len(self.test_dataset)}-{data_name}, "
                        f"Batch: {i}/{len(fragment_list)}"
                    )
                pred = vote.argmax(-1)
                score = (score_sum / np.maximum(score_cnt, 1)).astype(np.float32)
                np.save(pred_save_path, pred)
                np.save(score_save_path, score)
            if "origin_segment" in data_dict:
                assert "inverse" in data_dict
                pred = pred[data_dict["inverse"]]
                score = score[data_dict["inverse"]]
                segment = np.asarray(data_dict["origin_segment"]).reshape(-1)
            inter, union, target = intersection_and_union_np(
                pred, segment, num_classes, ignore_index
            )
            record[data_name] = dict(
                intersection=inter, union=union, target=target,
                score=score, segment=segment,
            )
            aupr, auroc = aupr_and_auroc(
                score, segment, cfg.unknown_label, ignore_index
            )
            if aupr is not None:
                aupr_meter.update(aupr)
                auroc_meter.update(auroc)
            batch_time.update(time.time() - end)
            cls_mask = (union != 0) & self.mask_known
            iou = np.mean((inter / np.maximum(union, 1e-10))[cls_mask])
            acc = inter[cls_mask].sum() / max(target[cls_mask].sum(), 1e-10)
            logger.info(
                f"Test: {data_name} [{idx + 1}/{len(self.test_dataset)}]-"
                f"{segment.size} Batch {batch_time.val:.3f} "
                f"({batch_time.avg:.3f}) Accuracy {acc:.4f} mIoU {iou:.4f} "
                f"aupr {aupr if aupr is None else format(aupr, '.4f')} "
                f"({aupr_meter.avg:.4f}) "
                f"auroc {auroc if auroc is None else format(auroc, '.4f')} "
                f"({auroc_meter.avg:.4f})"
            )
            self.write_submit(save_path, data_name, pred)

        logger.info("Syncing ...")
        gathered = comm.gather(record, dst=0)
        if comm.is_main_process():
            record = {k: v for r in gathered for k, v in r.items()}
            self.finalize(record, save_path, aupr_meter, auroc_meter)

    def finalize(self, record, save_path, aupr_meter, auroc_meter):
        cfg = self.cfg
        inter = np.sum([m["intersection"] for m in record.values()], axis=0)
        union = np.sum([m["union"] for m in record.values()], axis=0)
        target = np.sum([m["target"] for m in record.values()], axis=0)
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        m_iou = float(np.mean(iou_class[self.mask_known]))
        m_acc = float(np.mean(acc_class[self.mask_known]))
        all_acc = float(
            inter[self.mask_known].sum()
            / max(target[self.mask_known].sum(), 1e-10)
        )
        self.logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        all_score = np.concatenate([m["score"] for m in record.values()])
        all_segment = np.concatenate([m["segment"] for m in record.values()])
        all_aupr, all_auroc = aupr_and_auroc(
            all_score, all_segment, cfg.unknown_label
        )
        self.logger.info(
            f"Val result: aupr/auroc {aupr_meter.avg:.4f}/{auroc_meter.avg:.4f}"
        )
        if all_aupr is not None:
            self.logger.info(
                f"Val result: all points aupr/auroc {all_aupr:.4f}/{all_auroc:.4f}"
            )
        for c in range(cfg.data.num_classes):
            self.logger.info(
                f"Class_{c} - {cfg.data.names[c]} Result: iou/accuracy "
                f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        self.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


@TESTERS.register_module()
class ClsTester(TesterBase):
    """Classification tester (reference test.py:1121-1196)."""

    def test(self):
        logger = self.logger
        cfg = self.cfg
        num_classes = cfg.data.num_classes
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        totals = np.zeros((3, num_classes), np.float64)
        bs = cfg.get("batch_size_test") or 1

        indices = list(self.scene_indices())
        for start in range(0, len(indices), bs):
            samples = [self.test_dataset[i] for i in indices[start:start + bs]]
            collated = padded_collate_fn(
                samples, ignore_index=cfg.data.get("ignore_index", -1)
            )
            batch = self.device_batch(collated)
            if self.params is None:
                self.init_state(batch)
                self._forward = self.make_forward()
            out = self._forward(self.params, self.batch_stats, batch)
            pred = np.asarray(jax.device_get(out["cls_logits"])).argmax(-1)
            label = np.asarray(collated["category"]).reshape(-1)
            inter, union, target = intersection_and_union_np(
                pred.reshape(-1), label, num_classes,
                cfg.data.get("ignore_index", -1),
            )
            totals += np.stack([inter, union, target])
            acc = totals[0].sum() / max(totals[2].sum(), 1e-10)
            logger.info(
                f"Test: [{start + len(samples)}/{len(indices)}] "
                f"Accuracy {acc:.4f}"
            )

        totals = np.sum(np.stack(comm.all_gather(totals)), axis=0)
        inter, union, target = totals
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        logger.info(
            "Val result: mIoU/mAcc/allAcc "
            f"{np.mean(iou_class):.4f}/{np.mean(acc_class):.4f}/"
            f"{inter.sum() / max(target.sum(), 1e-10):.4f}."
        )
        for c in range(num_classes):
            logger.info(
                f"Class_{c} - {cfg.data.names[c]} Result: iou/accuracy "
                f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


def _softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


@TESTERS.register_module()
class PartSegTester(TesterBase):
    """ShapeNetPart tester: TTA-vote part labels per shape, category-wise
    part IoU (reference test.py:1199-1291)."""

    def test(self):
        logger = self.logger
        cfg = self.cfg
        num_classes = cfg.data.num_classes
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        dataset = self.test_dataset
        categories = dataset.categories
        category2part = dataset.category2part
        iou_category = np.zeros(len(categories))
        iou_count = np.zeros(len(categories))
        save_path = make_dirs(os.path.join(cfg.save_path, "result"))

        for idx in self.scene_indices():
            data = dataset[idx]
            fragment_list = data.pop("fragment_list")
            label = np.asarray(data.pop("segment")).reshape(-1)
            cls_token = data.pop("cls_token")
            data_name = data.pop("name")
            vote = np.zeros((label.size, num_classes), np.float32)
            for fragment in fragment_list:
                index = np.asarray(fragment["index"]).reshape(-1)
                fragment = dict(fragment)
                fragment.setdefault("category", np.array([cls_token]))
                out = self.forward_fragment(fragment)
                key = "seg_logits" if "seg_logits" in out else "cls_logits"
                np.add.at(vote, index, _softmax_np(out[key]))
            pred = vote.argmax(-1)
            category = categories[cls_token]
            parts = category2part[category]
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                gt, pd = label == part, pred == part
                if not gt.any() and not pd.any():
                    parts_iou[j] = 1.0
                else:
                    parts_iou[j] = (gt & pd).sum() / max((gt | pd).sum(), 1)
            iou_category[cls_token] += parts_iou.mean()
            iou_count[cls_token] += 1
            logger.info(
                f"Test: {data_name} [{idx + 1}/{len(dataset)}] "
                f"{category} iou {parts_iou.mean():.4f}"
            )
            np.save(os.path.join(save_path, f"{data_name}_pred.npy"), pred)

        totals = comm.all_gather((iou_category, iou_count))
        iou_category = np.sum([t[0] for t in totals], axis=0)
        iou_count = np.sum([t[1] for t in totals], axis=0)
        if comm.is_main_process():
            ins_iou = iou_category.sum() / max(iou_count.sum(), 1e-10)
            cat_iou = (
                iou_category[iou_count > 0] / iou_count[iou_count > 0]
            ).mean()
            logger.info(
                f"Val result: ins.mIoU/cat.mIoU {ins_iou:.4f}/{cat_iou:.4f}"
            )
            for i, name in enumerate(categories):
                if iou_count[i] > 0:
                    logger.info(
                        f"Class_{i}-{name} Result: iou_cat "
                        f"{iou_category[i] / iou_count[i]:.4f}"
                    )
            logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


@TESTERS.register_module()
class IncrSegTester(TesterBase):
    """Incremental-learning tester: fragment voting with the student
    (base+new classes), known/incr/remap metric triple
    (reference test.py:512-894)."""

    def __init__(self, cfg, **kwargs):
        from ..incr_learners import build_incremental_learner

        # built before super().__init__ so build_model (called there) can
        # reuse this single learner instead of constructing a second one
        self.incr_learner = build_incremental_learner(cfg.incremental_learner)
        super().__init__(cfg, **kwargs)
        self.remap = dict(cfg.incr_label_remap)
        self.base_num_classes = cfg.data.num_classes
        self.remap_num_classes = self.base_num_classes + len(self.remap)
        select = cfg.get("incr_label_select", list(self.remap.keys()))
        self.mask_known = ~selected_mask(
            list(self.remap.keys()), self.base_num_classes
        )
        self.incr_label_idx = [self.remap[k] for k in select if k in self.remap]
        self.mask_incr_remap = ~selected_mask(
            list(self.remap.keys()) + list(self.remap.values()),
            self.remap_num_classes,
        ) | selected_mask(self.incr_label_idx, self.remap_num_classes)

    def build_model(self):
        # the tested model is the student of the learner built in __init__
        return self.incr_learner.model

    def checkpoint_model_state(self):
        state = self.load_checkpoint_payload()["state"]
        params = state["params"]
        stats = state.get("batch_stats", {})
        if isinstance(params, dict) and "incr" in params:
            return params["incr"], stats.get("incr", {})
        return params, stats

    def make_forward(self):
        model = self.model

        @jax.jit
        def forward(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=False,
            )
            if isinstance(out, tuple):
                out = out[0]
            return {"seg_logits": out}

        return forward

    def test(self):
        logger = self.logger
        cfg = self.cfg
        k = self.remap_num_classes
        ignore_index = cfg.data.get("ignore_index", -1)
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        save_path = make_dirs(os.path.join(cfg.save_path, "result"))
        # remap lookup for the full-resolution ground truth
        lut_size = max([k] + [o + 1 for o in self.remap])
        lut = np.arange(lut_size)
        for old, new in self.remap.items():
            lut[old] = new
        record = {}

        for idx in self.scene_indices():
            data_dict = self.test_dataset[idx]
            fragment_list = data_dict.pop("fragment_list")
            segment = np.asarray(data_dict.pop("segment")).reshape(-1)
            data_name = data_dict.pop("name")
            pred_save_path = os.path.join(save_path, f"{data_name}_pred.npy")
            if os.path.isfile(pred_save_path):
                pred = np.load(pred_save_path)
            else:
                vote = np.zeros((segment.size, k), np.float32)
                for i, fragment in enumerate(fragment_list):
                    index = np.asarray(fragment["index"]).reshape(-1)
                    out = self.forward_fragment(fragment)
                    np.add.at(vote, index, _softmax_np(out["seg_logits"]))
                pred = vote.argmax(-1)
                np.save(pred_save_path, pred)
            if "origin_segment" in data_dict:
                pred = pred[data_dict["inverse"]]
                segment = np.asarray(data_dict["origin_segment"]).reshape(-1)
            target = np.where(
                segment == ignore_index, ignore_index,
                lut[np.clip(segment, 0, lut_size - 1)],
            )
            inter, union, tgt = intersection_and_union_np(
                pred, target, k, ignore_index
            )
            record[data_name] = dict(intersection=inter, union=union,
                                     target=tgt)
            logger.info(f"Test: {data_name} [{idx + 1}/{len(self.test_dataset)}]")

        gathered = comm.gather(record, dst=0)
        if comm.is_main_process():
            record = {kk: v for r in gathered for kk, v in r.items()}
            inter = np.sum([m["intersection"] for m in record.values()], axis=0)
            union = np.sum([m["union"] for m in record.values()], axis=0)
            target = np.sum([m["target"] for m in record.values()], axis=0)
            iou_class = inter / np.maximum(union, 1e-10)
            acc_class = inter / np.maximum(target, 1e-10)

            def triple(sel):
                return (
                    float(np.mean(iou_class[sel])),
                    float(np.mean(acc_class[sel])),
                    float(inter[sel].sum() / max(target[sel].sum(), 1e-10)),
                )

            for tag, sel in (
                ("known", np.where(self.mask_known)[0]),
                ("incr", np.asarray(self.incr_label_idx)),
                ("remap", np.where(self.mask_incr_remap)[0]),
            ):
                m_iou, m_acc, acc = triple(sel)
                logger.info(
                    f"Val result: mIoU/mAcc/Acc {tag} "
                    f"{m_iou:.4f}/{m_acc:.4f}/{acc:.4f}."
                )
            logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
