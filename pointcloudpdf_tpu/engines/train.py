"""Trainers: hook-driven epoch loops over a jit-compiled SPMD train step.

Fresh TPU-native re-design of the reference trainer stack
(pointcept/engines/train.py:42-566): the torch module/optimizer state
becomes an immutable ``TrainState`` pytree, ``run_step`` is a single
donated jit call (forward + loss + grad + optax update + BN stat update),
and data parallelism falls out of GSPMD — batches are sharded on the
leading dim over the device mesh, parameters replicated, and the loss mean
makes XLA insert the gradient psum. The hook lifecycle
(before/after train/epoch/step) and comm_info keys match the reference.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..datasets import build_dataset, padded_collate_fn
from ..datasets.loader import DataLoader
from ..models import build_model
from ..parallel.mesh import create_mesh, replicate_tree, shard_batch
from ..utils import comm
from ..utils.checkpoint import load_weights_into
from ..utils.events import EventStorage
from ..utils.logger import get_root_logger
from ..utils.optimizer import build_optimizer
from ..utils.registry import Registry
from ..utils.scheduler import build_scheduler
from .hooks import HOOKS, HookBase, build_hooks

TRAINERS = Registry("trainers")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class TrainerBase:
    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info: Dict = {}
        self.storage: Optional[EventStorage] = None
        self.logger = get_root_logger()

    def register_hooks(self, hooks_cfg) -> None:
        self.hooks = build_hooks(hooks_cfg)
        for hook in self.hooks:
            assert isinstance(hook, HookBase)
            hook.trainer = self

    def _call_hooks(self, stage: str) -> None:
        for hook in self.hooks:
            getattr(hook, stage)()

    def train(self):
        with EventStorage(self.start_epoch) as self.storage:
            self._call_hooks("before_train")
            for epoch in range(self.start_epoch, self.max_epoch):
                self.epoch = epoch
                if hasattr(self.train_loader, "set_epoch"):
                    self.train_loader.set_epoch(epoch)
                self._call_hooks("before_epoch")
                for i, input_dict in enumerate(self.train_loader):
                    self.comm_info["iter"] = i
                    self.comm_info["input_dict"] = input_dict
                    self._call_hooks("before_step")
                    self.run_step()
                    self._call_hooks("after_step")
                self._call_hooks("after_epoch")
                self.storage.reset_histories()
            self._call_hooks("after_train")

    def run_step(self):
        raise NotImplementedError


@TRAINERS.register_module("DefaultTrainer")
class Trainer(TrainerBase):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.best_metric_value = -1e9
        self.mesh = create_mesh()
        self.logger.info(
            f"Devices: {jax.device_count()} ({jax.devices()[0].platform}), "
            f"mesh axes: {self.mesh.axis_names}"
        )
        if self.mesh.devices.size > 1:
            # the fused Pallas train kernels flatten (B, N) and have no
            # GSPMD partitioning rule; multi-device training keeps the
            # unfused XLA path (sharded-reduction BNs stay free SyncBN)
            from ..models.point_transformer import modules as _ptmod

            if _ptmod.FUSED_ATTENTION == "auto":
                _ptmod.FUSED_ATTENTION = "off"
                self.logger.info(
                    "multi-device mesh: fused PT-v1 attention kernel off")
        self.max_epoch = cfg.eval_epoch
        self.model = self.build_model()
        self.train_loader = self.build_train_loader()
        self.val_loader = self.build_val_loader()
        self.writer = self.build_writer()
        self.total_steps = len(self.train_loader) * self.max_epoch
        self.scheduler = self.build_scheduler()
        self.tx = None           # finalized at lazy init (may need params)
        self.state: Optional[TrainState] = None
        self._pending_weight_load = None
        self._pending_resume = None
        self._base_rng = jax.random.PRNGKey(cfg.get("seed") or 0)
        self.register_hooks(cfg.get("hooks"))

    # -- builders ----------------------------------------------------------
    def build_model(self):
        model = build_model(dict(self.cfg.model))
        self.logger.info(f"Model: {self.cfg.model.type}")
        return model

    def build_train_loader(self):
        dataset = build_dataset(dict(self.cfg.data.train))
        collate = functools.partial(
            padded_collate_fn,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            ignore_index=self.cfg.data.get("ignore_index", -1),
        )
        return DataLoader(
            dataset,
            batch_size=self.cfg.batch_size,
            shuffle=True,
            drop_last=True,
            collate_fn=collate,
            num_workers=self.cfg.get("num_worker", 4),
            seed=self.cfg.get("seed") or 0,
            shard_id=comm.get_rank(),
            num_shards=comm.get_world_size(),
        )

    def build_val_loader(self):
        if not self.cfg.get("evaluate", True) or "val" not in self.cfg.data:
            return None
        dataset = build_dataset(dict(self.cfg.data.val))
        collate = functools.partial(
            padded_collate_fn,
            ignore_index=self.cfg.data.get("ignore_index", -1),
        )
        return DataLoader(
            dataset,
            batch_size=self.cfg.get("batch_size_val") or 1,
            shuffle=False,
            drop_last=False,
            collate_fn=collate,
            num_workers=self.cfg.get("num_worker", 4),
            shard_id=comm.get_rank(),
            num_shards=comm.get_world_size(),
        )

    def build_scheduler(self):
        return build_scheduler(
            dict(self.cfg.scheduler), self.cfg.optimizer.lr, self.total_steps
        )

    def build_writer(self):
        if not comm.is_main_process():
            return None
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(self.cfg.save_path)
        except Exception:
            return None

    def build_optimizer_tx(self, params):
        return build_optimizer(
            dict(self.cfg.optimizer),
            params=params,
            param_dicts=self.cfg.get("param_dicts"),
            lr_schedule=self.scheduler,
        )

    # -- loss contract ------------------------------------------------------
    def compute_loss(self, out: Dict, batch: Dict):
        """Return (total loss, aux scalar dict) per the reference contract
        (models/default.py:46-62: seg uses ``segment``, cls ``category``)."""
        if "loss" in out:
            # model computed its own loss (PointGroup, MSC, ...): pass
            # the scalar parts through for logging
            parts = {
                k: v for k, v in out.items()
                if getattr(v, "ndim", 1) == 0 and k != "loss"
            }
            return out["loss"], parts
        if "seg_logits" in out:
            loss = self.model.loss(out["seg_logits"], batch["segment"])
        elif "cls_logits" in out:
            loss = self.model.loss(out["cls_logits"], batch["category"])
        else:
            raise KeyError("model output lacks seg_logits/cls_logits")
        return loss, {}

    # -- jit steps -----------------------------------------------------------
    def _amp(self):
        """Mixed-precision context: with ``enable_amp`` the step's matmuls
        run in bfloat16 on the MXU (params/master state stay f32) — the
        TPU-native form of the reference's AMP autocast
        (engines/train.py:344-358)."""
        import contextlib

        if self.cfg.get("enable_amp"):
            return jax.default_matmul_precision("bfloat16")
        return contextlib.nullcontext()

    def _make_train_step(self):
        model = self.model
        tx = self.tx
        compute_loss = self.compute_loss
        amp = self._amp

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: Dict, rng):
            def loss_fn(params):
                with amp():
                    variables = {"params": params,
                                 "batch_stats": state.batch_stats}
                    out, mutated = model.apply(
                        variables,
                        batch,
                        train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": rng},
                    )
                    loss, parts = compute_loss(out, batch)
                return loss, (mutated["batch_stats"], parts)

            (loss, (batch_stats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, {"loss": loss, **parts}

        return train_step

    def _make_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(state: TrainState, batch: Dict):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return model.apply(variables, batch, train=False)

        return eval_step

    # -- state management ----------------------------------------------------
    def _init_variables(self, batch: Dict, rng):
        """Build the (params, batch_stats) trees; overridden by trainers
        that own more than one module (OpenSeg: backbone + recognizer).

        init runs under jit: eager flax init dispatches every op
        separately (hundreds of seconds for the PT U-Net); compiling the
        whole init is ~20x faster and hits the persistent compile cache.
        """
        variables = jax.jit(functools.partial(self.model.init, train=True))(
            {"params": rng, "dropout": rng}, batch
        )
        return variables["params"], variables.get("batch_stats", {})

    def initialize_state(self, batch: Dict):
        rng = jax.random.fold_in(self._base_rng, 0)
        params, batch_stats = self._init_variables(batch, rng)
        if self._pending_weight_load is not None:
            src, rewrite, strict, partial = self._pending_weight_load
            merged = load_weights_into(
                {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(batch_stats)},
                {"params": src.get("params", {}),
                 "batch_stats": src.get("batch_stats", {})},
                rewrite=rewrite,
                allow_partial_rows=partial,
            )
            params, batch_stats = merged["params"], merged["batch_stats"]
            self._pending_weight_load = None
        self.tx = self.build_optimizer_tx(params)
        opt_state = self.tx.init(params)
        if self._pending_resume is not None:
            opt_state = jax.tree_util.tree_map(
                lambda t, s: np.asarray(s) if np.shape(t) == np.shape(s) else t,
                opt_state,
                self._pending_resume.get("opt_state", opt_state),
            )
            step = jnp.asarray(self._pending_resume.get("step", 0), jnp.int32)
            self._pending_resume = None
        else:
            step = jnp.asarray(0, jnp.int32)
        state = TrainState(params, batch_stats, opt_state, step)
        self.state = replicate_tree(state, self.mesh)
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        self.logger.info(f"Initialized state: {n_params / 1e6:.2f}M params")

    def state_dict(self) -> Dict:
        return dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=int(self.state.step),
        )

    def load_state_dict(self, state: Dict, rewrite=None, strict=False,
                        allow_partial_rows=False):
        self._pending_weight_load = (state, rewrite, strict, allow_partial_rows)

    def resume_optimizer_state(self, state: Dict):
        self._pending_resume = state

    # -- the step -------------------------------------------------------------
    def device_batch(self, input_dict: Dict) -> Dict:
        batch = {
            k: v
            for k, v in input_dict.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        if "count" in batch:
            n_pad = batch["coord"].shape[1]
            mask = (
                np.arange(n_pad)[None, :] < batch["count"][:, None]
            )
            batch["mask"] = mask
        return shard_batch(batch, self.mesh)

    def run_step(self):
        batch = self.device_batch(self.comm_info["input_dict"])
        if self.state is None:
            self.initialize_state(batch)
            self._host_step = int(jax.device_get(self.state.step))
        # host-side step mirror: avoids a device sync per step for rng/lr
        rng = jax.random.fold_in(self._base_rng, self._host_step + 1)
        self.state, out = self._train_step(self.state, batch, rng)
        self._host_step += 1
        self.comm_info["model_output_dict"] = out
        self.comm_info["lr"] = float(self.scheduler(max(self._host_step - 1, 0)))

    def train(self):
        self.logger.info(
            f">>>>>>>>>>>>>>>> Start Training ({self.max_epoch} epochs, "
            f"{len(self.train_loader)} iters/epoch) >>>>>>>>>>>>>>>>"
        )
        super().train()
        self.logger.info("==>> Training done.")


@TRAINERS.register_module("OpenSegTrainer")
class OpenSegTrainer(Trainer):
    """Open-set trainer: backbone + recognizer trained jointly.

    Reference: pointcept/engines/train.py:313-499.  The forward-hook
    machinery becomes the backbone's ``intermediates`` return; backbone
    and recognizer params share one TrainState/optimizer (the reference's
    joint build_open_optimizer, train.py:393-399); the recognizer's
    requires_grad freeze until ``start_epoch`` becomes masking its updates
    by the epoch-dependent loss weight.  The PDF pseudo-labeling runs on
    host between a jitted score/neighbor pass and the jitted train step.
    """

    def __init__(self, cfg):
        from ..recognizers import build_recognizer

        self.recognizer = build_recognizer(cfg.recognizer)
        super().__init__(cfg)
        self.eval_only = cfg.get("eval_only", False)
        self.best_metric_value = {}  # metric name -> best value
        self._pseudo_forward = None
        self._pending = None  # pipelined (batch, rec_w, flagged) awaiting train

    # -- label handling ------------------------------------------------------
    def device_batch(self, input_dict: Dict) -> Dict:
        input_dict = dict(input_dict)
        # open-set label rename (reference train.py:387-391): train on
        # known-masked labels, keep the oracle for evaluation
        if "segment_known" in input_dict:
            input_dict["segment_oracle"] = input_dict["segment"]
            input_dict["segment"] = input_dict["segment_known"]
        if "segment_pseudo" not in input_dict and "segment" in input_dict:
            input_dict["segment_pseudo"] = input_dict["segment"]
        return super().device_batch(input_dict)

    # -- data ------------------------------------------------------------------
    def build_train_loader(self):
        loader = super().build_train_loader()
        # optional random subsampling of the train scenes (reference
        # engines/train.py:428-436, train_subsampling_ratio)
        ratio = self.cfg.get("train_subsampling_ratio", -1.0)
        if ratio > 0.0:
            from ..datasets.loader import Subset

            n = len(loader.dataset)
            keep = int(ratio * n)
            rng = np.random.RandomState(self.cfg.get("seed") or 0)
            picked = np.sort(rng.permutation(n)[:keep])
            loader.dataset = Subset(loader.dataset, picked)
            self.logger.info(
                f"Train subsampling: kept {keep}/{n} scenes "
                f"(ratio={ratio})"
            )
        return loader

    # -- state ----------------------------------------------------------------
    def _init_variables(self, batch: Dict, rng):
        variables = jax.jit(functools.partial(self.model.init, train=True))(
            {"params": rng, "dropout": rng}, batch
        )
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if getattr(self.recognizer, "has_params", False):
            out = jax.jit(
                functools.partial(self.model.apply, train=False)
            )(variables, batch)
            rec_vars = jax.jit(
                functools.partial(self.recognizer.model.init, train=True)
            )({"params": rng}, out["intermediates"])
            params["recognizer"] = rec_vars["params"]
            batch_stats["recognizer"] = rec_vars.get("batch_stats", {})
            n_rec = sum(
                x.size for x in jax.tree_util.tree_leaves(params["recognizer"])
            )
            self.logger.info(f"Num params of recognizer: {n_rec}")
        else:
            params["recognizer"] = {}
            batch_stats["recognizer"] = {}
        return params, batch_stats

    # -- jit steps -------------------------------------------------------------
    def _make_train_step(self):
        model = self.model
        rec = self.recognizer
        rec_module = rec.model if getattr(rec, "has_params", False) else None
        tx = self.tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: Dict, rng, rec_w):
            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params["model"],
                     "batch_stats": state.batch_stats["model"]},
                    batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                seg_logits = out["seg_logits"]
                seg_loss = model.loss(seg_logits, batch["segment"])
                parts = {"seg_loss": seg_loss}
                new_stats = {"model": mut["batch_stats"]}
                if rec_module is not None:
                    rec_raw, mut_r = rec_module.apply(
                        {"params": params["recognizer"],
                         "batch_stats": state.batch_stats["recognizer"]},
                        out["intermediates"], train=True,
                        mutable=["batch_stats"],
                    )
                    rec_l = rec.rec_loss(
                        seg_logits, rec_raw, batch["segment_pseudo"]
                    )
                    loss = seg_loss + rec_w * rec_l
                    parts["loss_rec"] = rec_l
                    new_stats["recognizer"] = mut_r["batch_stats"]
                else:
                    loss = seg_loss
                    new_stats["recognizer"] = state.batch_stats["recognizer"]
                parts["loss"] = loss
                return loss, (new_stats, parts)

            (loss, (batch_stats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            # recognizer frozen while its loss weight is zero (the
            # reference's requires_grad toggle, pointpdf :384-398): zero
            # grads alone would still let weight decay move the params
            active = (rec_w > 0).astype(jnp.float32)
            updates = dict(updates)
            updates["recognizer"] = jax.tree_util.tree_map(
                lambda u: u * active, updates["recognizer"]
            )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, parts

        return train_step

    def _make_eval_step(self):
        model = self.model
        rec = self.recognizer
        rec_module = rec.model if getattr(rec, "has_params", False) else None

        @jax.jit
        def eval_step(state: TrainState, batch: Dict):
            out = model.apply(
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]},
                batch, train=False,
            )
            seg_logits = out["seg_logits"]
            if rec_module is not None:
                rec_raw = rec_module.apply(
                    {"params": state.params["recognizer"],
                     "batch_stats": state.batch_stats["recognizer"]},
                    out["intermediates"], train=False,
                )
                score = rec.score(seg_logits, rec_raw)
            else:
                score = rec.score(seg_logits)
            return {"seg_logits": seg_logits, "score": score}

        return eval_step

    def _make_pseudo_forward(self):
        model = self.model
        rec = self.recognizer

        @jax.jit
        def pseudo_forward(state: TrainState, batch: Dict):
            # scores ONLY: 2 floats/point to fetch instead of the (N, K)
            # logits + (N, Kn) neighbor payload (the table is built
            # host-side from the coords the trainer already holds, and
            # overlaps this device pass — VERDICT r3 item 6)
            out = model.apply(
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]},
                batch, train=False,
            )
            return rec.pseudo_scores(out["seg_logits"], batch["mask"])

        return pseudo_forward

    def _host_radii(self, coord_h, count_h):
        """Per-sample ball radius: static, or the reference's adaptive
        min-extent/16 (pointpdf_v1m1_base.py:118-137)."""
        rec = self.recognizer
        radii = np.full((coord_h.shape[0],), rec.kp_ball_radius, np.float64)
        if rec.adaptive_radius:
            for i in range(coord_h.shape[0]):
                c = int(count_h[i])
                if c:
                    pts = coord_h[i, :c]
                    radii[i] = float((pts.max(0) - pts.min(0) + 1e-6).min()
                                     / 16.0)
        return radii

    def initialize_state(self, batch: Dict):
        super().initialize_state(batch)
        if getattr(self.recognizer, "has_pseudo_labeling", False):
            self._pseudo_forward = self._make_pseudo_forward()

    # -- the step ---------------------------------------------------------------
    #
    # Pseudo-labeling pipeline (one-batch delay): the jitted train step
    # for batch t-1 is dispatched right after the score pass for batch t,
    # so the device crunches t-1's fwd+bwd WHILE the host fetches t's two
    # score sheets and runs the graph stage (mean-shift -> MST -> GMM ->
    # CC).  Semantically this only makes the scores one optimizer update
    # staler than the reference's in-step computation — blessed by the
    # same argument as its async joblib usage.  Neighbor tables are lazy
    # cKDTree rows (LazyNeighborTable): the chain reads ~2% of the cloud.
    def _dispatch_train(self, batch, rec_w, pseudo_flagged=None):
        rng = jax.random.fold_in(self._base_rng, self._host_step + 1)
        self.state, out = self._train_step(
            self.state, batch, rng, jnp.asarray(rec_w, jnp.float32)
        )
        self._host_step += 1
        if pseudo_flagged is not None:
            out = dict(out)
            out["pseudo_flagged"] = pseudo_flagged
        self.comm_info["model_output_dict"] = out
        self.comm_info["lr"] = float(self.scheduler(max(self._host_step - 1, 0)))

    def _flush_pending(self):
        if getattr(self, "_pending", None) is not None:
            batch, rec_w, flagged = self._pending
            self._pending = None
            self._dispatch_train(batch, rec_w, flagged)

    def _call_hooks(self, stage: str) -> None:
        # evaluation/checkpointing must see the fully-trained state
        if stage in ("after_epoch", "after_train"):
            self._flush_pending()
        super()._call_hooks(stage)

    def run_step(self):
        input_dict = self.comm_info["input_dict"]
        batch = self.device_batch(input_dict)
        if self.state is None:
            self.initialize_state(batch)
            self._host_step = int(jax.device_get(self.state.step))

        rec = self.recognizer
        rec.set_epoch(self.epoch)
        rec_w = rec.loss_weight(self.epoch)
        if not (getattr(rec, "has_pseudo_labeling", False)
                and rec.needs_pseudo(self.epoch)):
            self._dispatch_train(batch, rec_w)
            return

        # 1. device: score pass for THIS batch (queued before the pending
        #    train step, so its results are ready first)
        msp_d, ml_d = self._pseudo_forward(self.state, batch)
        # 2. device: train step for the PREVIOUS batch (mask ready)
        self._flush_pending()
        # 3. host: fetch scores + graph stage, overlapped with step 2
        coord_h = np.asarray(input_dict["coord"], np.float32)
        count_h = np.asarray(input_dict["count"])
        masks = rec.pseudo_masks_from_scores(
            coord_h,
            np.asarray(jax.device_get(msp_d)),
            np.asarray(jax.device_get(ml_d)),
            count_h,
            seed=(self.cfg.get("seed") or 0) + self._host_step,
            neighbors=None,
            ball_radius=self._host_radii(coord_h, count_h),
        )
        # host copy of the TRAIN labels (post label-rename semantics:
        # device_batch substitutes segment_known when present)
        segment = np.asarray(input_dict.get("segment_known",
                                            input_dict["segment"]))
        segment_pseudo = np.where(masks, rec.num_classes, segment)
        from ..parallel.mesh import shard_batch

        batch["segment_pseudo"] = shard_batch(
            {"segment_pseudo": segment_pseudo}, self.mesh
        )["segment_pseudo"]
        # surfaced via InformationWriter so runs (and the CLI
        # convergence proof) can see the pseudo-labeling fire
        valid = np.asarray(jax.device_get(batch["mask"]))
        flagged = float(masks[valid].mean()) if valid.any() else 0.0
        self._pending = (batch, rec_w, flagged)

    def train(self):
        if self.eval_only:
            self.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
            with EventStorage(self.start_epoch) as self.storage:
                self._call_hooks("before_train")
                if self.state is None and self.val_loader is not None:
                    first = next(iter(self.val_loader))
                    self.initialize_state(self.device_batch(first))
                    self._host_step = 0
                for epoch in range(self.start_epoch, self.max_epoch):
                    self.epoch = epoch
                    self._call_hooks("after_epoch")
                self._call_hooks("after_train")
            return
        super().train()


@TRAINERS.register_module("IncrSegTrainer")
class IncrSegTrainer(Trainer):
    """Incremental-learning trainer: frozen teacher distills into an
    extended student.

    Reference: pointcept/engines/train.py:502-566.  ``self.model`` is the
    base (teacher) architecture whose variables are loaded from the base
    checkpoint and never optimized — TPU-natively they are a constant
    input to the jitted step rather than excluded param groups; the
    TrainState holds only the student (``incr``) subtree.
    """

    def __init__(self, cfg):
        from ..incr_learners import build_incremental_learner

        self.incr_learner = build_incremental_learner(cfg.incremental_learner)
        super().__init__(cfg)
        self.best_metric_value = {}
        self.teacher_variables = None
        self._pending_teacher = None

    def load_teacher_state(self, state: Dict):
        self._pending_teacher = state

    def _init_variables(self, batch: Dict, rng):
        # teacher (base model): constant variables, loaded from base_ckpt
        t_vars = jax.jit(functools.partial(self.model.init, train=False))(
            {"params": rng, "dropout": rng}, batch
        )
        teacher = {
            "params": jax.device_get(t_vars["params"]),
            "batch_stats": jax.device_get(t_vars.get("batch_stats", {})),
        }
        if self._pending_teacher is not None:
            teacher = load_weights_into(
                teacher,
                {"params": self._pending_teacher.get("params", {}),
                 "batch_stats": self._pending_teacher.get("batch_stats", {})},
            )
            self._pending_teacher = None
        from ..parallel.mesh import replicate_tree

        self.teacher_variables = replicate_tree(teacher, self.mesh)

        # student: the only optimized params
        s_vars = jax.jit(
            functools.partial(self.incr_learner.model.init, train=True)
        )({"params": jax.random.fold_in(rng, 1), "dropout": rng}, batch)
        return (
            {"incr": s_vars["params"]},
            {"incr": s_vars.get("batch_stats", {})},
        )

    @staticmethod
    def _logits_of(out):
        if isinstance(out, tuple):
            return out[0]
        if isinstance(out, dict):
            return out.get("seg_logits", out)
        return out

    def _make_train_step(self):
        teacher_model = self.model
        student = self.incr_learner.model
        learner = self.incr_learner
        tx = self.tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: Dict, rng, teacher_vars):
            def loss_fn(params):
                out, mut = student.apply(
                    {"params": params["incr"],
                     "batch_stats": state.batch_stats["incr"]},
                    batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                stu_logits = IncrSegTrainer._logits_of(out)
                t_out = teacher_model.apply(teacher_vars, batch, train=False)
                t_logits = IncrSegTrainer._logits_of(t_out)
                loss = learner.distill_loss(
                    stu_logits, t_logits, batch["segment_incr"], batch["mask"]
                )
                return loss, ({"incr": mut["batch_stats"]}, {"loss": loss})

            (loss, (batch_stats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, parts

        return train_step

    def _make_eval_step(self):
        student = self.incr_learner.model
        learner = self.incr_learner

        @jax.jit
        def eval_step(state: TrainState, batch: Dict):
            out = student.apply(
                {"params": state.params["incr"],
                 "batch_stats": state.batch_stats["incr"]},
                batch, train=False,
            )
            seg_logits = IncrSegTrainer._logits_of(out)
            loss = learner.eval_loss(seg_logits, batch["segment_incr_remap"])
            return {"seg_logits": seg_logits, "loss": loss}

        return eval_step

    def run_step(self):
        batch = self.device_batch(self.comm_info["input_dict"])
        if self.state is None:
            self.initialize_state(batch)
            self._host_step = int(jax.device_get(self.state.step))
        rng = jax.random.fold_in(self._base_rng, self._host_step + 1)
        self.state, out = self._train_step(
            self.state, batch, rng, self.teacher_variables
        )
        self._host_step += 1
        self.comm_info["model_output_dict"] = out
        self.comm_info["lr"] = float(self.scheduler(max(self._host_step - 1, 0)))


@TRAINERS.register_module("MultiDatasetTrainer")
class MultiDatasetTrainer(Trainer):
    """Joint multi-dataset training (PPT).

    Reference: pointcept/engines/train.py:296-310 — swaps the train loader
    for MultiDatasetDataloader.  Each batch carries one dataset's
    ``condition`` string; the string is a *static* argument, so the step
    compiles once per dataset condition (the reference's per-condition
    module indexing, TPU-style).
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        self._cond_steps: Dict[str, Any] = {}
        # capability flag: does the model's __call__ accept a `condition`
        # kwarg (PPT/PDNorm models do, plain segmentors don't)?  Decided
        # once by signature inspection — never by catching TypeError inside
        # the traced function, which would swallow unrelated errors.
        import inspect

        self._model_takes_condition = "condition" in inspect.signature(
            type(self.model).__call__
        ).parameters

    def build_train_loader(self):
        from ..datasets.loader import MultiDatasetDataloader

        dataset = build_dataset(dict(self.cfg.data.train))
        collate = functools.partial(
            padded_collate_fn,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            ignore_index=self.cfg.data.get("ignore_index", -1),
        )
        return MultiDatasetDataloader(
            dataset,
            batch_size=self.cfg.batch_size,
            collate_fn=collate,
            num_workers=self.cfg.get("num_worker", 4),
            seed=self.cfg.get("seed") or 0,
            shard_id=comm.get_rank(),
            num_shards=comm.get_world_size(),
        )

    def _make_train_step_for(self, condition):
        model = self.model
        tx = self.tx
        cond_kwargs = (
            {"condition": condition} if self._model_takes_condition else {}
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: Dict, rng):
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                out, mutated = model.apply(
                    variables, batch, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                    **cond_kwargs,
                )
                loss, parts = self.compute_loss(out, batch)
                return loss, (mutated["batch_stats"], parts)

            (loss, (batch_stats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                params=params, batch_stats=batch_stats,
                opt_state=opt_state, step=state.step + 1,
            ), {"loss": loss, **parts}

        return train_step

    def run_step(self):
        input_dict = self.comm_info["input_dict"]
        condition = None
        if "condition" in input_dict:
            cond = input_dict["condition"]
            condition = cond[0] if isinstance(cond, (list, tuple)) else str(cond)
        batch = self.device_batch(input_dict)
        if self.state is None:
            self.initialize_state(batch)
            self._host_step = int(jax.device_get(self.state.step))
        if condition is None:
            super().run_step()
            return
        if condition not in self._cond_steps:
            self._cond_steps[condition] = self._make_train_step_for(condition)
        rng = jax.random.fold_in(self._base_rng, self._host_step + 1)
        self.state, out = self._cond_steps[condition](self.state, batch, rng)
        self._host_step += 1
        self.comm_info["model_output_dict"] = out
        self.comm_info["lr"] = float(self.scheduler(max(self._host_step - 1, 0)))

    # condition-aware eval: the evaluator calls _eval_step(state, batch);
    # the current batch's condition is captured by device_batch
    def device_batch(self, input_dict: Dict) -> Dict:
        cond = input_dict.get("condition")
        self._current_condition = (
            cond[0] if isinstance(cond, (list, tuple)) else cond
        )
        return super().device_batch(input_dict)

    def _make_eval_step(self):
        model = self.model
        cache: Dict[Any, Any] = {}

        takes_condition = self._model_takes_condition

        def eval_step(state: TrainState, batch: Dict):
            cond = getattr(self, "_current_condition", None)
            if cond not in cache:
                kw = (
                    {"condition": cond}
                    if takes_condition and cond is not None else {}
                )

                def apply_fn(s, b, _kw=kw):
                    variables = {"params": s.params,
                                 "batch_stats": s.batch_stats}
                    return model.apply(variables, b, train=False, **_kw)

                cache[cond] = jax.jit(apply_fn)
            return cache[cond](state, batch)

        return eval_step
