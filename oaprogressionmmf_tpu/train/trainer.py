"""Training-loop runtime: the TPU-native ProgressionPrediction.

Equivalent of the train runtime inside koafusion/run/train_prog_fus.py:
45-332, re-designed for XLA: the entire per-batch pipeline — device-side
augmentation (unit-range → rotate → gamma → normalize), "last-chance"
downscale, bf16 forward, focal loss, backward, optimizer update, BN-stat
update, LR schedule — is ONE jitted function with donated state. Data
parallelism comes from the mesh sharding of the batch axis; XLA inserts the
gradient all-reduce over ICI (replacing nn.DataParallel,
train_prog_fus.py:84).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import MODEL_ARITY, dict_models
from ..ops.losses import dict_losses
from ..ops.preproc import make_augment_fn
from ..ops.resize import interpolate, interpolate_fast
from ..parallel.mesh import create_mesh
from ..utils.checkpoint import load_ckpt, make_checkpoint_handler
from ..utils.metrics import calc_metrics_v2
from .state import TrainState, state_to_serializable

logger = logging.getLogger("train")


class MetricsLogger:
    """JSONL scalar log (+ TensorBoard when available).

    Replaces the reference's SummaryWriter usage
    (train_prog_fus.py:104,160-163,277-301)."""

    def __init__(self, path_dir):
        self.path_dir = Path(path_dir)
        self.path_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path_dir / "scalars.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(str(self.path_dir))
        except Exception:  # tensorboard optional
            pass

    def scalar(self, tag: str, value, step: int):
        self._fh.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), global_step=step)

    def flush(self):
        self._fh.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if not self._fh.closed:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()


def _modality_xs(batch: dict, modals) -> tuple:
    return tuple(batch[f"image__{m}"] for m in modals)


class _Runtime:
    """Model + loss + optimizer + jitted steps, shared across folds.

    jax.jit caches on function identity — rebuilding closures per fold would
    recompile the train/eval steps 5x per experiment. One runtime per
    (model config, training config, modals, steps_per_epoch, dtype) key."""

    def __init__(self, config, modals, downscale, steps_per_epoch,
                 compute_dtype):
        from ..ops.schedules import make_lr_schedule
        from .state import dict_optimizers

        model_cfg = (config.model.to_dict()
                     if hasattr(config.model, "to_dict")
                     else dict(config.model))
        self.model = dict_models[config.model.name](
            config=model_cfg, compute_dtype=compute_dtype)
        loss_cfg = config.training.loss
        self.loss_fn = dict_losses[loss_cfg.name](
            num_classes=int(config.model.output_channels),
            **dict(loss_cfg.params))

        optim_cfg = config.training.optim
        sched_cfg = config.training.sched
        kwargs = {}
        wd = optim_cfg.get("weight_decay", 0.0)
        if wd:
            kwargs["weight_decay"] = float(wd)
        if sched_cfg.name == "ReduceLROnPlateau":
            # metric-driven schedule: the LR lives in the optimizer's
            # injected hyperparams; the trainer's per-fold
            # ops.schedules.ReduceLROnPlateau controller overrides it after
            # each validation epoch (torch semantics, host-side)
            import optax
            opt_name = optim_cfg.name

            def _tx_factory(learning_rate):
                return dict_optimizers[opt_name](
                    lambda _step: learning_rate, **kwargs)

            self.tx = optax.inject_hyperparams(_tx_factory)(
                learning_rate=float(optim_cfg.lr_init))
            self.lr_schedule = None
            self.plateau_cfg = dict(sched_cfg.params)
        else:
            self.lr_schedule = make_lr_schedule(
                sched_cfg.name, dict(sched_cfg.params),
                lr_init=float(optim_cfg.lr_init),
                steps_per_epoch=steps_per_epoch)
            self.tx = dict_optimizers[optim_cfg.name](self.lr_schedule,
                                                      **kwargs)
            self.plateau_cfg = None

        self.preproc_train = make_preprocess_fn(
            modals, downscale, train=True,
            augment_full_res=config.training.get("augment_full_res", None))
        self.preproc_eval = make_preprocess_fn(modals, downscale, train=False)

        model, tx, loss_fn = self.model, self.tx, self.loss_fn
        preproc_train, preproc_eval = self.preproc_train, self.preproc_eval

        def train_step(state: TrainState, xs, ys, key):
            k_aug, k_drop = jax.random.split(key)
            xs = preproc_train(xs, k_aug)

            def loss_of(params):
                variables = {"params": params}
                mutable = []
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(variables, *xs, train=True,
                                  rngs={"dropout": k_drop}, mutable=mutable)
                out, mutated = out if mutable else (out, {})
                logits = out["main"] if isinstance(out, dict) else out
                loss = loss_fn(logits, ys)
                return loss, (mutated.get("batch_stats", state.batch_stats),
                              logits)

            (loss, (new_stats, logits)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   batch_stats=new_stats, opt_state=new_opt)
            return new_state, loss, logits

        def eval_step(params, batch_stats, xs, ys):
            xs = preproc_eval(xs)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, *xs, train=False)
            logits = out["main"] if isinstance(out, dict) else out
            loss = loss_fn(logits, ys)
            probs = jax.nn.softmax(logits, axis=-1)
            return loss, probs

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step)

        def train_steps(state: TrainState, xs_stack, ys_stack, keys):
            """k steps in ONE dispatch (lax.scan over stacked batches).

            Amortizes per-step host dispatch/sync (the per-step loss
            materialization costs a full round trip per batch — through a
            remote tunnel that round trip is ~30 ms); losses come back as
            a (k,) array so the NaN guard and per-batch logging still see
            every step. Select with ``training.steps_per_dispatch``.
            """
            def body(st, inp):
                xs, ys, key = inp
                st2, loss, _ = train_step(st, xs, ys, key)
                return st2, loss

            return jax.lax.scan(body, state, (xs_stack, ys_stack, keys))

        self.train_steps = jax.jit(train_steps, donate_argnums=(0,))


_RUNTIME_CACHE: dict = {}


def _shared_runtime(config, modals, downscale, steps_per_epoch,
                    compute_dtype) -> _Runtime:
    model_cfg = (config.model.to_dict() if hasattr(config.model, "to_dict")
                 else dict(config.model))
    training_cfg = (config.training.to_dict()
                    if hasattr(config.training, "to_dict")
                    else dict(config.training))
    key = (json.dumps(model_cfg, sort_keys=True, default=str),
           json.dumps({k: training_cfg.get(k) for k in
                       ("loss", "optim", "sched")}, sort_keys=True,
                      default=str),
           tuple(modals), json.dumps(downscale), int(steps_per_epoch),
           str(compute_dtype))
    if key not in _RUNTIME_CACHE:
        _RUNTIME_CACHE[key] = _Runtime(config, modals, downscale,
                                       steps_per_epoch, compute_dtype)
    return _RUNTIME_CACHE[key]


def make_preprocess_fn(modals, downscale, train: bool,
                       augment_full_res: bool | None = None,
                       fast: bool = False):
    """Per-batch device preprocessing for all modalities, jit-fusable.

    Eval path exploits that unit-range and normalization are affine while
    the downscale is linear: the per-sample min/max reductions run on the
    raw (often uint) volume, the downscale runs on the raw values, and the
    affine correction is applied to the small tensor — two fewer full
    passes over the pre-downscale volume, numerically identical up to f32
    reassociation.

    Train path: the reference augments at full resolution and then
    downscales inside the model; that ordering is the default
    (``augment_full_res=True`` in prog_fus.yaml). Setting it false moves
    the stochastic augmentation (rotate/gamma) AFTER the downscale — ~2×
    faster (the rotation's bilinear gathers on the full-res volume
    measured ~585 ms of a 1236 ms flagship batch-16 step; 8× fewer voxels
    after downscale) but NOT equivalent to the reference ordering: gamma
    is pointwise-nonlinear, so commuting it with the linear downscale
    changes values (same augmentation *distribution*, different per-sample
    results — see PARITY.md). Env override: OAPROG_AUGMENT_FULL_RES=0/1.
    """
    import os

    if augment_full_res is None:
        env = os.environ.get("OAPROG_AUGMENT_FULL_RES")
        # reference-exact ordering unless explicitly disabled
        augment_full_res = True if env is None else env not in ("0", "")
    # serving-fast downscale (bf16 MXU dots; see ops.resize.interpolate_fast)
    # — callers enable it with the int8-serving regime; env overrides both
    # ways for experiments
    fenv = os.environ.get("OAPROG_FAST_PREPROC")
    if fenv is not None:
        fast = fenv not in ("0", "")
    fast = fast and not train
    from ..ops.preproc import MODALITY_STATS
    # post-downscale augment (the fast non-parity regime) also runs the
    # rotation gathers + pointwise math in bf16 (ops.preproc.make_augment_fn
    # fast mode) — the model casts its inputs to bf16 right after anyway
    fast_aug = bool(train and not augment_full_res)
    aug_fns = [make_augment_fn(m, fast=fast_aug) if train else None
               for m in modals]

    def preprocess(xs: tuple, key=None) -> tuple:
        out = []
        for i, (m, x) in enumerate(zip(modals, xs)):
            if m == "clin":
                out.append(x.astype(jnp.float32))
                continue
            if train:
                keys = jax.random.split(jax.random.fold_in(key, i),
                                        x.shape[0])
                if downscale and not augment_full_res:
                    # bf16-dot downscale feeding the bf16 fast augment
                    # (no f32 round-trip between them)
                    x = interpolate_fast(x, tuple(downscale[i]),
                                         out_dtype=jnp.bfloat16)
                    x = jax.vmap(aug_fns[i])(x, keys)
                else:
                    x = jax.vmap(aug_fns[i])(x, keys)
                    if downscale:
                        x = interpolate(x, tuple(downscale[i]))
            else:
                red_axes = tuple(range(1, x.ndim))
                if fast:
                    # min/max on the raw dtype (no f32 copy of the volume)
                    lo = jnp.min(x, axis=red_axes,
                                 keepdims=True).astype(jnp.float32)
                    hi = jnp.max(x, axis=red_axes,
                                 keepdims=True).astype(jnp.float32)
                    xf = (interpolate_fast(x, tuple(downscale[i]))
                          if downscale else x.astype(jnp.float32))
                else:
                    xf = x.astype(jnp.float32)
                    lo = jnp.min(xf, axis=red_axes, keepdims=True)
                    hi = jnp.max(xf, axis=red_axes, keepdims=True)
                    if downscale:
                        xf = interpolate(xf, tuple(downscale[i]))
                mean, std = MODALITY_STATS[m]
                x = ((xf - lo) / (hi - lo) - mean) / std
            out.append(x)
        return tuple(out)

    return preprocess


class ProgressionTrainer:
    """Wires model + optimizer + loss + loaders + checkpointing for one fold."""

    def __init__(self, config, fold_idx: int, *, mesh=None,
                 compute_dtype=jnp.float32, data_shard=(0, 1)):
        from ..data.pipeline import SequentialSampler, WeightedSampler, \
            make_batch_loader
        from ..data.provider import prepare_datasets

        self.config = config
        self.fold_idx = fold_idx
        self.mesh = mesh if mesh is not None else create_mesh()
        self.compute_dtype = compute_dtype
        # multi-host data sharding: (process_index, process_count) from
        # parallel.dcn — each host's loaders decode a disjoint slice of
        # every epoch; batch sizes below are PER-HOST (SURVEY.md §5.8)
        self.data_shard = (int(data_shard[0]), int(data_shard[1]))

        ds_cfg = next(iter(config.data.sets.values()))
        self.modals = list(ds_cfg.modals)
        self.datasets = prepare_datasets(config, fold_idx)[ds_cfg.name]

        if config.data.get("debug", False):
            # intensity/NaN/zero-slice sweep over the selected subset
            # (reference behavior: _data_provider.py:443-458)
            self.datasets["sel"].describe()

        arity = MODEL_ARITY[config.model.name]
        if arity != len(self.modals):
            raise ValueError(
                f"Model {config.model.name} expects {arity} modalities, "
                f"got {self.modals}")

        # loaders
        train_ds = self.datasets["train"]
        if config.training.sampler == "weighted":
            targets = train_ds.df_meta[("-", "target")].values.astype(int)
            sampler = WeightedSampler(targets, seed=config.seed_train_val)
        elif config.training.sampler == "default":
            sampler = SequentialSampler(len(train_ds))
        else:
            raise ValueError(f"Invalid sampler {config.training.sampler}")

        nw = int(config.get("num_workers", 8))
        lb = config.get("loader_backend", "threads")
        shard = dict(shard_index=self.data_shard[0],
                     shard_count=self.data_shard[1])
        self.loaders = {
            "train": make_batch_loader(
                lb, train_ds, sampler, int(config.training.batch_size),
                drop_last=True, mesh=self.mesh, num_workers=nw, **shard),
            "val": make_batch_loader(
                lb, self.datasets["val"],
                SequentialSampler(len(self.datasets["val"])),
                int(config.validation.batch_size),
                drop_last=True, mesh=self.mesh, num_workers=nw, **shard),
            "test": make_batch_loader(
                lb, self.datasets["test"],
                SequentialSampler(len(self.datasets["test"])),
                int(config.testing.batch_size),
                drop_last=False, pad_to_batch=True,
                mesh=self.mesh, num_workers=nw, **shard),
        }

        # experiment dirs + checkpoint handler (reference layout:
        # weights/prog/fold_k, train_prog_fus.py:61-72)
        root = Path(config.path_experiment_root)
        self.path_weights_fold = root / "weights" / "prog" / f"fold_{fold_idx}"
        self.path_weights_fold.mkdir(parents=True, exist_ok=True)
        self.path_logs_fold = root / "logs_train" / f"fold_{fold_idx}"
        self.tb = MetricsLogger(self.path_logs_fold)
        self.ckpt = make_checkpoint_handler(
            self.path_weights_fold,
            backend=config.training.get("ckpt_backend", "msgpack"))

        self.downscale = (config.model.get("downscale") or None)
        if self.downscale:
            self.downscale = [list(f) for f in self.downscale]

        # shared (cross-fold) model/optimizer/jitted-step runtime
        self.steps_per_epoch = max(1, self.loaders["train"].batches_per_epoch())
        rt = _shared_runtime(config, tuple(self.modals), self.downscale,
                             self.steps_per_epoch, compute_dtype)
        self.model = rt.model
        self.loss_fn = rt.loss_fn
        self.tx = rt.tx
        self.lr_schedule = rt.lr_schedule
        self._preproc_train = rt.preproc_train
        self._preproc_eval = rt.preproc_eval
        self._train_step = rt.train_step
        self._train_steps = rt.train_steps
        self._eval_step = rt.eval_step

        # per-fold metric-driven LR controller (runtime is shared/stateless)
        self._plateau = None
        if rt.plateau_cfg is not None:
            from ..ops.schedules import ReduceLROnPlateau
            params = dict(rt.plateau_cfg)
            params.setdefault(
                "mode",
                "min" if config.validation.criterion == "loss" else "max")
            self._plateau = ReduceLROnPlateau(
                lr_init=float(config.training.optim.lr_init), **params)

        # init / resume
        self._init_state()

    # ------------------------------------------------------------------

    def _example_inputs(self):
        """Zero batches with the post-crop shapes (pre-device-preproc).

        Batch 2, not the training batch size: parameter shapes are
        batch-independent and init at full batch would waste a full-size
        forward compile."""
        sizes = [list(s) for s in self.config.model.input_size]
        bs = 2
        xs = []
        for m, size in zip(self.modals, sizes):
            if m == "clin":
                xs.append(jnp.zeros((bs, 1, 9), jnp.float32))
            else:
                xs.append(jnp.zeros((bs, 1, *size), jnp.float32))
        return tuple(xs)

    def _init_state(self):
        xs = self._example_inputs()
        xs = self._preproc_eval(xs)
        variables = self.model.init(jax.random.key(0), *xs, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params))

        # ImageNet initialization of the CNN encoders (fe.*.pretrained)
        from ..utils.pretrained import apply_pretrained_fes
        model_cfg = (self.config.model.to_dict()
                     if hasattr(self.config.model, "to_dict")
                     else dict(self.config.model))
        params = jax.device_get(state.params)
        stats = jax.device_get(state.batch_stats)
        params, stats, n_grafted = apply_pretrained_fes(model_cfg, params,
                                                        stats)
        if n_grafted:
            logger.info(f"Grafted ImageNet weights into {n_grafted} FEs")
            state = TrainState(step=state.step, params=params,
                               batch_stats=stats,
                               opt_state=self.tx.init(params))
        # explicit weight restore (reference constructor contract:
        # Model(config, path_weights) with restore_weights, _xr1_cnn.py:41-42).
        # Accepts our .ckpt payloads or reference-named torch .pth files.
        if model_cfg.get("restore_weights") and model_cfg.get("path_weights"):
            path_w = str(model_cfg["path_weights"])
            if path_w.endswith((".pth", ".pt")):
                import torch

                from ..utils.torch_interop import import_reference_checkpoint
                sd = torch.load(path_w, map_location="cpu",
                                weights_only=True)
                sd = {k: v.numpy() for k, v in sd.items()}
                restored = import_reference_checkpoint(
                    self.config.model.name, sd,
                    depth=int(model_cfg["agg"].get("depth", 4))
                    if "agg" in model_cfg else 4)
                state = TrainState(step=state.step,
                                   params=restored["params"],
                                   batch_stats=restored["batch_stats"],
                                   opt_state=self.tx.init(restored["params"]))
                logger.info(f"Restored reference checkpoint {path_w}")
            else:
                payload = load_ckpt(path_w,
                                    target=state_to_serializable(state))
                state = TrainState(step=payload["step"],
                                   params=payload["params"],
                                   batch_stats=payload["batch_stats"],
                                   opt_state=payload["opt_state"])
                logger.info(f"Restored checkpoint {path_w}")

        self.state = state
        self.start_epoch = 0

        last = self.ckpt.get_last_ckpt()
        if last is not None:
            try:
                payload = load_ckpt(last, target=self._ckpt_payload(state))
            except Exception:
                # checkpoint predates the plateau-state payload extension
                payload = load_ckpt(last, target=state_to_serializable(state))
            self.state = TrainState(step=payload["step"],
                                    params=payload["params"],
                                    batch_stats=payload["batch_stats"],
                                    opt_state=payload["opt_state"])
            if self._plateau is not None:
                if "plateau" in payload:
                    self._plateau.load_state_dict(
                        {k: np.asarray(v).item()
                         for k, v in payload["plateau"].items()})
                else:
                    # legacy checkpoint: at least keep the restored reduced
                    # LR instead of resetting to lr_init
                    self._plateau.current_lr = float(np.asarray(
                        self.state.opt_state.hyperparams["learning_rate"]))
            self.start_epoch = int(self.state.step) // self.steps_per_epoch
            logger.info(f"Resumed from {last} at epoch {self.start_epoch}")

    def _ckpt_payload(self, state=None) -> dict:
        """Full-state checkpoint payload; includes the host-side plateau
        controller state so metric-driven LR survives resume exactly."""
        payload = state_to_serializable(
            self.state if state is None else state)
        if self._plateau is not None:
            sd = self._plateau.state_dict()
            payload["plateau"] = {
                "current_lr": np.asarray(sd["current_lr"], np.float64),
                "best": np.asarray(sd["best"], np.float64),
                "num_bad_epochs": np.asarray(sd["num_bad_epochs"], np.int64),
                "cooldown_counter": np.asarray(sd["cooldown_counter"],
                                               np.int64),
            }
        return payload

    # ------------------------------------------------------------------

    def train_epoch(self, epoch_idx: int) -> dict:
        losses = []
        steps = self.loaders["train"].batches_per_epoch()
        base_key = jax.random.key(self.config.seed_train_val + 1000)
        # k>1 chains k steps in one jit dispatch (losses still per-step);
        # debug echo needs per-step logits, so it forces k=1
        k = int(self.config.training.get("steps_per_dispatch", 1) or 1)
        if self.config.training.get("debug", False):
            k = 1

        def handle_losses(step_losses, first_step_idx) -> bool:
            for j, loss in enumerate(step_losses):
                loss = float(loss)
                losses.append(loss)
                if not np.isfinite(loss):
                    # NaN guard (SURVEY §5.2): fail loudly, don't train on
                    logger.error(f"Non-finite loss at epoch {epoch_idx} "
                                 f"step {first_step_idx + j}; stopping "
                                 f"epoch")
                    return False
                self.tb.scalar(f"fold_{self.fold_idx}/loss_prog_batch/train",
                               loss,
                               epoch_idx * steps + first_step_idx + j)
            return True

        pending: list = []          # [(xs, ys, key)] awaiting a k-chunk
        pending_first = 0

        def flush() -> bool:
            nonlocal pending, pending_first
            if not pending:
                return True
            if len(pending) < k:
                # ragged tail: per-step dispatch reuses the single-step
                # compile instead of paying a fresh scan compile per
                # distinct remainder length
                ok = True
                for j, (xs, ys, key) in enumerate(pending):
                    self.state, loss, _ = self._train_step(self.state, xs,
                                                           ys, key)
                    ok = handle_losses([loss], pending_first + j)
                    if not ok:
                        break
            else:
                xs_stack = tuple(
                    jnp.stack([p[0][i] for p in pending])
                    for i in range(len(pending[0][0])))
                ys_stack = jnp.stack([p[1] for p in pending])
                keys = jnp.stack([p[2] for p in pending])
                self.state, step_losses = self._train_steps(
                    self.state, xs_stack, ys_stack, keys)
                ok = handle_losses(np.asarray(step_losses), pending_first)
            pending = []
            return ok

        for step_idx, batch in enumerate(
                self.loaders["train"].epoch(epoch_idx)):
            xs = _modality_xs(batch, self.modals)
            ys = batch["target"][:, 0]
            key = jax.random.fold_in(base_key, epoch_idx * steps + step_idx)
            if k <= 1:
                self.state, loss, logits = self._train_step(self.state, xs,
                                                            ys, key)
                if self.config.training.get("debug", False):
                    logger.info(
                        f"Pred: {np.argmax(np.asarray(logits), axis=1)}")
                    logger.info(f"True: {np.asarray(ys)}")
                if not handle_losses([loss], step_idx):
                    break
            else:
                if not pending:
                    pending_first = step_idx
                pending.append((xs, ys, key))
                if len(pending) == k and not flush():
                    break
        else:
            flush()
        return {"loss_prog": float(np.mean(losses)) if losses else np.nan}

    def val_epoch(self, epoch_idx: int) -> dict:
        losses, targets, probas = [], [], []
        steps = self.loaders["val"].batches_per_epoch()
        for step_idx, batch in enumerate(self.loaders["val"].epoch(epoch_idx)):
            xs = _modality_xs(batch, self.modals)
            ys = batch["target"][:, 0]
            loss, probs = self._eval_step(self.state.params,
                                          self.state.batch_stats, xs, ys)
            losses.append(float(loss))
            targets.append(np.asarray(ys))
            probas.append(np.asarray(probs))
            self.tb.scalar(f"fold_{self.fold_idx}/loss_prog_batch/val",
                           float(loss), epoch_idx * steps + step_idx)
        metrics = calc_metrics_v2(
            prog_target=np.concatenate(targets),
            prog_pred_proba=np.concatenate(probas),
            target=self.config.data.target)
        metrics["loss_prog"] = float(np.mean(losses)) if losses else np.nan
        return metrics

    def fit(self) -> dict:
        """Epoch loop with best-checkpoint selection on the val criterion
        (criterion rules: train_prog_fus.py:241-248)."""
        crit_name = self.config.validation.criterion
        if crit_name == "loss":
            crit_best, crit_rule = float("inf"), lambda new, ref: new <= ref
        elif crit_name in ("b_accuracy", "avg_precision"):
            crit_best, crit_rule = 0.0, lambda new, ref: new >= ref
        else:
            raise ValueError(f"Unknown criterion: {crit_name}")

        best = {"epoch": -1, "val": {}}
        num_epochs = int(self.config.training.epochs.num)
        for epoch_idx in range(self.start_epoch, num_epochs):
            t0 = time.time()
            metrics_train = self.train_epoch(epoch_idx)
            metrics_val = self.val_epoch(epoch_idx)

            for k, v in {**{f"train/{k}": v for k, v in metrics_train.items()},
                         **{f"val/{k}": v for k, v in metrics_val.items()}}.items():
                if isinstance(v, (int, float, np.floating)) and np.isfinite(v):
                    self.tb.scalar(f"fold_{self.fold_idx}/{k}", v, epoch_idx)
            lr_now = (self._plateau.current_lr if self._plateau is not None
                      else float(self.lr_schedule(int(self.state.step))))
            self.tb.scalar(f"fold_{self.fold_idx}/learning_rate", lr_now,
                           epoch_idx)
            self.tb.flush()
            logger.info(
                f"fold {self.fold_idx} epoch {epoch_idx}: "
                f"train_loss={metrics_train['loss_prog']:.4f} "
                f"val_loss={metrics_val['loss_prog']:.4f} "
                f"val_{crit_name}="
                f"{metrics_val.get(crit_name, metrics_val['loss_prog'])} "
                f"({time.time() - t0:.1f}s)")

            crit_curr = metrics_val["loss_prog"] if crit_name == "loss" \
                else metrics_val[crit_name]
            if np.isnan(crit_curr):
                continue
            if self._plateau is not None:
                new_lr = self._plateau.step(crit_curr)
                self.state = self.state.replace(
                    opt_state=self.state.opt_state._replace(
                        hyperparams={**self.state.opt_state.hyperparams,
                                     "learning_rate":
                                     jnp.asarray(new_lr, jnp.float32)}))
            if crit_rule(crit_curr, crit_best):
                crit_best = crit_curr
                best = {"epoch": epoch_idx, "val": metrics_val}
                self.ckpt.save_new_ckpt(
                    self._ckpt_payload(),
                    model_name=self.config.model.name,
                    fold_idx=self.fold_idx, epoch_idx=epoch_idx)

        logger.info(f"Finished fold {self.fold_idx}: best {crit_name}="
                    f"{crit_best} at epoch {best['epoch']}")
        self.tb.close()
        return {"criterion": crit_name, "best": crit_best,
                "epoch": best["epoch"], "val_metrics": best["val"]}
