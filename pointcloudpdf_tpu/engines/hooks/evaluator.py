"""Per-epoch evaluation hooks.

Fresh equivalents of the reference evaluators
(pointcept/engines/hooks/evaluator.py): the IoU histogram runs on device
(jit) with padded-point masking; cross-process reduction uses host object
allgather; mIoU/mAcc/allAcc definitions match utils/misc.py:55-87.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...utils import comm
from ...utils.misc import aupr_and_auroc, intersection_and_union, selected_mask
from .builder import HOOKS
from .default import HookBase


def _evaluate_batches(trainer, score_fn):
    """Iterate the val loader, apply eval step, feed results to score_fn."""
    for i, input_dict in enumerate(trainer.val_loader):
        batch = trainer.device_batch(input_dict)
        out = trainer._eval_step(trainer.state, batch)
        score_fn(i, batch, input_dict, out)


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    """Closed-set semantic segmentation mIoU/mAcc/allAcc
    (reference evaluator.py:492-588)."""

    def __init__(self, write_cls_iou: bool = True):
        self.write_cls_iou = write_cls_iou

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader:
            self.eval()

    def eval(self):
        trainer = self.trainer
        num_classes = trainer.cfg.data.num_classes
        ignore_index = trainer.cfg.data.get("ignore_index", -1)
        totals = np.zeros((3, num_classes), np.float64)
        loss_sum, loss_cnt = 0.0, 0

        @jax.jit
        def batch_counts(seg_logits, segment, mask):
            pred = jnp.argmax(seg_logits, axis=-1)
            return intersection_and_union(
                pred, segment, num_classes, ignore_index, valid_mask=mask
            )

        loss_fn = jax.jit(trainer.model.loss)

        def score(i, batch, input_dict, out):
            nonlocal loss_sum, loss_cnt
            if "origin_coord" in input_dict:
                inter, union, target = self._origin_counts(
                    input_dict, out, num_classes, ignore_index
                )
            else:
                inter, union, target = batch_counts(
                    out["seg_logits"], batch["segment"], batch["mask"]
                )
            loss = loss_fn(out["seg_logits"], batch["segment"])
            totals[0] += np.asarray(inter)
            totals[1] += np.asarray(union)
            totals[2] += np.asarray(target)
            loss_sum += float(loss)
            loss_cnt += 1
            if (i + 1) % 10 == 0:
                trainer.logger.info(
                    f"Test: [{i + 1}/{len(trainer.val_loader)}] Loss {float(loss):.4f}"
                )

        _evaluate_batches(trainer, score)

        # cross-process reduction of the histograms
        gathered = comm.all_gather(totals)
        totals_all = np.sum(np.stack(gathered), axis=0)
        inter, union, target = totals_all
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter.sum() / max(target.sum(), 1e-10))

        trainer.logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        if self.write_cls_iou:
            names = trainer.cfg.data.get("names", list(range(num_classes)))
            for c in range(num_classes):
                trainer.logger.info(
                    f"Class_{c}-{names[c]} Result: iou/accuracy "
                    f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
                )
        epoch = trainer.epoch + 1
        if trainer.writer is not None:
            trainer.writer.add_scalar("val/loss", loss_sum / max(loss_cnt, 1), epoch)
            trainer.writer.add_scalar("val/mIoU", m_iou, epoch)
            trainer.writer.add_scalar("val/mAcc", m_acc, epoch)
            trainer.writer.add_scalar("val/allAcc", all_acc, epoch)
        trainer.comm_info["current_metric_value"] = m_iou
        trainer.comm_info["current_metric_name"] = "mIoU"

    @staticmethod
    def _origin_counts(input_dict, out, num_classes, ignore_index):
        """Re-project voxel predictions to the original full-resolution
        points with a 1-NN lookup, then score against ``origin_segment``
        (the reference's "Interp." eval, hooks/evaluator.py:512-520).

        Runs on host (cKDTree): origin point counts vary per scene, so a
        jitted kNN would recompile every batch.
        """
        from scipy.spatial import cKDTree

        from ...utils.misc import intersection_and_union_np

        pred = np.asarray(jax.device_get(out["seg_logits"])).argmax(-1)
        coord = np.asarray(input_dict["coord"])
        counts = np.asarray(input_dict["count"]).reshape(-1)
        ocoord = np.asarray(input_dict["origin_coord"])
        oseg = np.asarray(input_dict["origin_segment"])
        if ocoord.ndim == 2:
            ocoord, oseg = ocoord[None], oseg[None]
        totals = np.zeros((3, num_classes), np.float64)
        for b in range(pred.shape[0]):
            n = int(counts[b])
            _, nn = cKDTree(coord[b, :n]).query(ocoord[b], k=1)
            re_pred = pred[b, :n][nn]
            i, u, t = intersection_and_union_np(
                re_pred, oseg[b].reshape(-1), num_classes, ignore_index
            )
            totals += np.stack([i, u, t])
        return totals[0], totals[1], totals[2]

    def after_train(self):
        self.trainer.logger.info(
            f"Best mIoU: {self.trainer.best_metric_value:.4f}"
        )


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    """Classification accuracy evaluator (reference evaluator.py:408-489)."""

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader:
            self.eval()

    def eval(self):
        trainer = self.trainer
        num_classes = trainer.cfg.data.num_classes
        totals = np.zeros((3, num_classes), np.float64)
        loss_sum, loss_cnt = 0.0, 0

        @jax.jit
        def batch_counts(cls_logits, category):
            pred = jnp.argmax(cls_logits, axis=-1)
            return intersection_and_union(pred, category, num_classes, -1)

        loss_fn = jax.jit(trainer.model.loss)

        def score(i, batch, input_dict, out):
            nonlocal loss_sum, loss_cnt
            inter, union, target = batch_counts(
                out["cls_logits"], batch["category"]
            )
            loss = loss_fn(out["cls_logits"], batch["category"])
            totals[0] += np.asarray(inter)
            totals[1] += np.asarray(union)
            totals[2] += np.asarray(target)
            loss_sum += float(loss)
            loss_cnt += 1

        _evaluate_batches(trainer, score)
        gathered = comm.all_gather(totals)
        totals_all = np.sum(np.stack(gathered), axis=0)
        inter, union, target = totals_all
        acc_class = inter / np.maximum(target, 1e-10)
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter.sum() / max(target.sum(), 1e-10))
        trainer.logger.info(f"Val result: mAcc/allAcc {m_acc:.4f}/{all_acc:.4f}")
        epoch = trainer.epoch + 1
        if trainer.writer is not None:
            trainer.writer.add_scalar("val/loss", loss_sum / max(loss_cnt, 1), epoch)
            trainer.writer.add_scalar("val/mAcc", m_acc, epoch)
            trainer.writer.add_scalar("val/allAcc", all_acc, epoch)
        trainer.comm_info["current_metric_value"] = all_acc
        trainer.comm_info["current_metric_name"] = "allAcc"

    def after_train(self):
        self.trainer.logger.info(
            f"Best allAcc: {self.trainer.best_metric_value:.4f}"
        )


@HOOKS.register_module()
class OpenSegEvaluator(HookBase):
    """Open-set evaluation: known-class mIoU + unknown AUPR/AUROC.

    Reference: pointcept/engines/hooks/evaluator.py:27-229.  The oracle
    labels (with unknown classes intact) score the recognizer; the
    closed-set histogram is reduced over known classes only; AUPR/AUROC
    are per-batch records averaged across batches and processes.
    """

    def before_train(self):
        cfg = self.trainer.cfg
        self.num_classes = cfg.data.num_classes
        self.ignore_index = cfg.data.get("ignore_index", -1)
        self.unknown_label = cfg.unknown_label
        self.mask_known = ~selected_mask(self.unknown_label, self.num_classes)

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader:
            self.eval()

    def eval(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = self.num_classes
        ignore_index = self.ignore_index
        totals = np.zeros((3, num_classes), np.float64)
        auprs, aurocs = [], []
        loss_sum, loss_cnt = 0.0, 0

        @jax.jit
        def batch_counts(seg_logits, segment, mask):
            pred = jnp.argmax(seg_logits, axis=-1)
            return intersection_and_union(
                pred, segment, num_classes, ignore_index, valid_mask=mask
            )

        loss_fn = jax.jit(trainer.model.loss)

        for i, input_dict in enumerate(trainer.val_loader):
            batch = trainer.device_batch(input_dict)
            out = trainer._eval_step(trainer.state, batch)
            oracle = batch.get("segment_oracle", batch["segment"])
            inter, union, target = batch_counts(
                out["seg_logits"], oracle, batch["mask"]
            )
            loss = loss_fn(out["seg_logits"], batch["segment"])
            totals[0] += np.asarray(inter)
            totals[1] += np.asarray(union)
            totals[2] += np.asarray(target)
            loss_sum += float(loss)
            loss_cnt += 1
            # mask padded slots out of the score records via the oracle's
            # ignore padding (collation pads label keys with ignore_index)
            aupr, auroc = aupr_and_auroc(
                np.asarray(jax.device_get(out["score"])),
                np.asarray(jax.device_get(oracle)),
                self.unknown_label,
                ignore_index,
            )
            if aupr is not None:
                auprs.append(aupr)
                aurocs.append(auroc)
            trainer.logger.info(
                f"Test: [{i + 1}/{len(trainer.val_loader)}] Loss {float(loss):.4f}"
            )

        # cross-process reduction
        totals_all = np.sum(np.stack(comm.all_gather(totals)), axis=0)
        records = comm.all_gather({"aupr": auprs, "auroc": aurocs})
        auprs = [a for r in records for a in r["aupr"]]
        aurocs = [a for r in records for a in r["auroc"]]
        aupr_avg = float(np.mean(auprs)) if auprs else float("nan")
        auroc_avg = float(np.mean(aurocs)) if aurocs else float("nan")

        inter, union, target = totals_all
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        m_iou = float(np.mean(iou_class[self.mask_known]))
        m_acc = float(np.mean(acc_class[self.mask_known]))
        all_acc = float(
            inter[self.mask_known].sum()
            / max(target[self.mask_known].sum(), 1e-10)
        )
        trainer.logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}."
        )
        trainer.logger.info(
            f"Val result: aupr/auroc {aupr_avg:.4f}/{auroc_avg:.4f}"
        )
        names = trainer.cfg.data.get("names", list(range(num_classes)))
        for c in range(num_classes):
            trainer.logger.info(
                f"Class_{c}-{names[c]} Result: iou/accuracy "
                f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        epoch = trainer.epoch + 1
        if trainer.writer is not None:
            trainer.writer.add_scalar("val/loss", loss_sum / max(loss_cnt, 1), epoch)
            trainer.writer.add_scalar("val/mIoU", m_iou, epoch)
            trainer.writer.add_scalar("val/mAcc", m_acc, epoch)
            trainer.writer.add_scalar("val/allAcc", all_acc, epoch)
            trainer.writer.add_scalar("val/aupr", aupr_avg, epoch)
            trainer.writer.add_scalar("val/auroc", auroc_avg, epoch)
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = [m_iou, aupr_avg, auroc_avg]
        trainer.comm_info["current_metric_name"] = ["mIoU", "aupr", "auroc"]

    def after_train(self):
        best = self.trainer.best_metric_value
        if isinstance(best, dict):
            for name, value in best.items():
                self.trainer.logger.info(f"Best {name}: {value:.4f}")


@HOOKS.register_module()
class IncrSegEvaluator(HookBase):
    """Incremental-learning evaluation: known/incr/remap metric triple.

    Reference: pointcept/engines/hooks/evaluator.py:232-405.  Targets are
    ``segment_incr_remap`` over base+new classes; mIoU is reported for the
    retained base classes (known), the newly learned classes (incr), and
    the remapped union (remap).
    """

    def before_train(self):
        cfg = self.trainer.cfg
        self.base_num_classes = cfg.data.num_classes
        self.remap = dict(cfg.incr_label_remap)
        self.remap_num_classes = self.base_num_classes + len(self.remap)
        self.ignore_index = cfg.data.get("ignore_index", -1)
        select = cfg.get("incr_label_select", list(self.remap.keys()))
        self.mask_known = ~selected_mask(
            list(self.remap.keys()), self.base_num_classes
        )
        self.incr_label_idx = [self.remap[k] for k in select if k in self.remap]
        self.mask_incr_remap = ~selected_mask(
            list(self.remap.keys()) + list(self.remap.values()),
            self.remap_num_classes,
        ) | selected_mask(self.incr_label_idx, self.remap_num_classes)
        self.map_reverse = {v: k for k, v in self.remap.items()}

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader:
            self.eval()

    def eval(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        k = self.remap_num_classes
        ignore_index = self.ignore_index
        totals = np.zeros((3, k), np.float64)
        loss_sum, loss_cnt = 0.0, 0

        @jax.jit
        def batch_counts(seg_logits, segment, mask):
            pred = jnp.argmax(seg_logits, axis=-1)
            return intersection_and_union(
                pred, segment, k, ignore_index, valid_mask=mask
            )

        for i, input_dict in enumerate(trainer.val_loader):
            batch = trainer.device_batch(input_dict)
            out = trainer._eval_step(trainer.state, batch)
            inter, union, target = batch_counts(
                out["seg_logits"], batch["segment_incr_remap"], batch["mask"]
            )
            totals[0] += np.asarray(inter)
            totals[1] += np.asarray(union)
            totals[2] += np.asarray(target)
            loss = float(out["loss"])
            loss_sum += loss
            loss_cnt += 1
            trainer.logger.info(
                f"Test: [{i + 1}/{len(trainer.val_loader)}] Loss {loss:.4f}"
            )

        totals = np.sum(np.stack(comm.all_gather(totals)), axis=0)
        inter, union, target = totals
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)

        def triple(mask_or_idx):
            return dict(
                mIoU=float(np.mean(iou_class[mask_or_idx])),
                mAcc=float(np.mean(acc_class[mask_or_idx])),
                Acc=float(
                    inter[mask_or_idx].sum()
                    / max(target[mask_or_idx].sum(), 1e-10)
                ),
            )

        known = triple(np.where(self.mask_known)[0])
        incr = triple(np.asarray(self.incr_label_idx))
        remap = triple(np.where(self.mask_incr_remap)[0])
        for tag, m in (("known", known), ("incr", incr), ("remap", remap)):
            trainer.logger.info(
                f"Val result: mIoU/mAcc/Acc {tag} "
                f"{m['mIoU']:.4f}/{m['mAcc']:.4f}/{m['Acc']:.4f}."
            )
        names = trainer.cfg.data.get("names", list(range(k)))
        for c in range(k):
            base_c = self.map_reverse.get(c, c)
            prefix = "Increment " if c >= self.base_num_classes else ""
            trainer.logger.info(
                f"{prefix}Class_{c}-{names[base_c]} Result: iou/accuracy "
                f"{iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        epoch = trainer.epoch + 1
        if trainer.writer is not None:
            trainer.writer.add_scalar("val/loss", loss_sum / max(loss_cnt, 1), epoch)
            for tag, m in (("", known), ("_incr", incr), ("_remap", remap)):
                trainer.writer.add_scalar(f"val/mIoU{tag}", m["mIoU"], epoch)
                trainer.writer.add_scalar(f"val/mAcc{tag}", m["mAcc"], epoch)
                trainer.writer.add_scalar(f"val/allAcc{tag}", m["Acc"], epoch)
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = [
            known["mIoU"], incr["mIoU"], remap["mIoU"]
        ]
        trainer.comm_info["current_metric_name"] = [
            "mIoU_known", "mIoU_incr", "mIoU_remap"
        ]

    def after_train(self):
        best = self.trainer.best_metric_value
        if isinstance(best, dict):
            for name, value in best.items():
                self.trainer.logger.info(f"Best {name}: {value:.4f}")


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    """Instance segmentation mAP (ScanNet protocol, compact form).

    Reference: pointcept/engines/hooks/evaluator.py:591-968.  Proposals
    come from the model's host-side ``propose`` (radius-graph clustering
    of center-shifted points); AP is averaged over IoU thresholds
    0.5:0.95:0.05 plus the mAP@50/mAP@25 headline numbers, with greedy
    score-ordered matching per scene and class.
    """

    def __init__(self, segment_ignore_index=(-1, 0, 1),
                 instance_ignore_index=-1):
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index

    def before_train(self):
        self.num_classes = self.trainer.cfg.data.num_classes
        self.valid_classes = [
            c for c in range(self.num_classes)
            if c not in self.segment_ignore_index
        ]

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader:
            self.eval()

    def eval(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        scenes = []
        for i, input_dict in enumerate(trainer.val_loader):
            batch = trainer.device_batch(input_dict)
            out = trainer._eval_step(trainer.state, batch)
            seg_logits = np.asarray(jax.device_get(out["seg_logits"]))
            bias_pred = np.asarray(jax.device_get(out["bias_pred"]))
            coord = np.asarray(input_dict["coord"])
            segment = np.asarray(input_dict["segment"])
            instance = np.asarray(input_dict["instance"])
            counts = np.asarray(input_dict["count"])
            model = trainer.model
            for b in range(len(counts)):
                n = int(counts[b])
                masks, classes, scores = model.propose(
                    coord[b, :n], seg_logits[b, :n], bias_pred[b, :n],
                    np.ones(n, bool),
                )
                gt_masks, gt_classes = [], []
                inst = instance[b, :n]
                seg = segment[b, :n]
                for iid in np.unique(inst):
                    if iid == self.instance_ignore_index:
                        continue
                    m = inst == iid
                    cls = np.bincount(
                        seg[m][seg[m] >= 0], minlength=self.num_classes
                    ).argmax() if (seg[m] >= 0).any() else -1
                    if cls in self.segment_ignore_index:
                        continue
                    gt_masks.append(m)
                    gt_classes.append(int(cls))
                scenes.append(dict(
                    masks=masks, classes=classes, scores=scores,
                    gt_masks=np.stack(gt_masks) if gt_masks else
                    np.zeros((0, n), bool),
                    gt_classes=np.asarray(gt_classes, np.int64),
                ))
            trainer.logger.info(
                f"Test: [{i + 1}/{len(trainer.val_loader)}]"
            )

        all_scenes = [s for r in comm.all_gather(scenes) for s in r]
        overlaps = np.append(np.arange(0.5, 0.96, 0.05), 0.25)
        ap_table = np.zeros((len(overlaps), len(self.valid_classes)))
        for oi, overlap in enumerate(overlaps):
            for ci, cls in enumerate(self.valid_classes):
                ap_table[oi, ci] = self._class_ap(all_scenes, cls, overlap)
        m_ap = float(np.nanmean(ap_table[: -1]))
        m_ap50 = float(np.nanmean(ap_table[0]))
        m_ap25 = float(np.nanmean(ap_table[-1]))
        trainer.logger.info(
            f"Val result: mAP/AP50/AP25 {m_ap:.4f}/{m_ap50:.4f}/{m_ap25:.4f}."
        )
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = m_ap50
        trainer.comm_info["current_metric_name"] = "AP50"

    @staticmethod
    def _class_ap(scenes, cls, overlap):
        records = []   # (score, is_tp)
        n_gt = 0
        for sc in scenes:
            gt_sel = np.where(sc["gt_classes"] == cls)[0]
            n_gt += len(gt_sel)
            pr_sel = np.where(sc["classes"] == cls)[0]
            if len(pr_sel) == 0:
                continue
            order = pr_sel[np.argsort(-sc["scores"][pr_sel])]
            matched = np.zeros(len(gt_sel), bool)
            for p in order:
                pm = sc["masks"][p]
                best_iou, best_j = 0.0, -1
                for j, g in enumerate(gt_sel):
                    if matched[j]:
                        continue
                    gm = sc["gt_masks"][g]
                    iou = (pm & gm).sum() / max((pm | gm).sum(), 1)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_iou >= overlap and best_j >= 0:
                    matched[best_j] = True
                    records.append((sc["scores"][p], 1))
                else:
                    records.append((sc["scores"][p], 0))
        if n_gt == 0:
            return np.nan
        if not records:
            return 0.0
        records.sort(key=lambda r: -r[0])
        tp = np.cumsum([r[1] for r in records])
        fp = np.cumsum([1 - r[1] for r in records])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1e-12)
        # VOC-style AP: integrate the PR envelope
        rec = np.concatenate([[0.0], recall, [recall[-1]]])
        pre = np.concatenate([[1.0], precision, [0.0]])
        for k in range(len(pre) - 2, -1, -1):
            pre[k] = max(pre[k], pre[k + 1])
        return float(np.sum((rec[1:] - rec[:-1]) * pre[1:]))
