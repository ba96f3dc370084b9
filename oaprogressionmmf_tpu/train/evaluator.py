"""Evaluation runtime: fold-wise test predictions, fold ensembling,
modality-ablation explanation, and profiling.

Contract parity with koafusion/run/eval_prog_fus.py:54-512:
  * per-fold best-checkpoint restore → test-set predictions cached as
    pickles with keys {exam_knee_id, target, predict, predict_proba},
  * fold ensemble = mean of per-fold softmax probs, then softmax again
    (the reference's double-softmax quirk, eval_prog_fus.py:335-340),
  * metrics via calc_metrics_v2, pickled fold-wise + ensemble,
  * `modal_abl` explanation = whole-modality zeroing ablation: per modality
    attr = logit_target(x) - logit_target(x with that modality zeroed) —
    the semantics of captum FeatureAblation with one mask per modality
    (eval_prog_fus.py:442-462) without captum,
  * profile modes: "time" (wall-clock per-sample) and "compute"
    (XLA FLOPs via compiled cost analysis, replacing thop).
"""

from __future__ import annotations

import functools
import logging
import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.special import softmax

from ..utils.checkpoint import load_ckpt, make_checkpoint_handler
from ..utils.metrics import calc_metrics_v2
from .trainer import ProgressionTrainer, make_preprocess_fn, _modality_xs

logger = logging.getLogger("eval")


class ProgressionEvaluator:
    """Fold-wise evaluation over the (fold-independent) test subset."""

    def __init__(self, config, *, mesh=None, compute_dtype=jnp.float32,
                 data_shard=(0, 1)):
        self.config = config
        # loaders for fold 0 only — the test subset is fold-independent
        # (eval_prog_fus.py:55-87)
        self.trainer = ProgressionTrainer(config, fold_idx=0, mesh=mesh,
                                          compute_dtype=compute_dtype,
                                          data_shard=data_shard)
        self.modals = self.trainer.modals
        self.path_weights = Path(config.path_experiment_root) / "weights"
        # logs subdir "incid"/"all" selects the knee cohort label exactly as
        # the reference does (eval_prog_fus.py:81-85; T2-map experiments use
        # the incidence cohort)
        sel_knee = ("incid" if "sag_t2_map" in list(config.data.modals_all)
                    else "all")
        self.path_logs = (Path(config.path_experiment_root) / "logs_eval" /
                          sel_knee)
        self.path_logs.mkdir(parents=True, exist_ok=True)

        if config.testing.folds.idx == -1:
            self.fold_idcs = list(range(int(config.training.folds.num)))
        else:
            self.fold_idcs = [int(config.testing.folds.idx)]
        ignore = config.testing.folds.get("ignore")
        if ignore:
            self.fold_idcs = [i for i in self.fold_idcs if i not in ignore]

        # int8 serving quantization (testing.quant=int8): per-fold
        # activation-scale calibration on the first test batch, then the
        # quantized graph for the remaining batches (ops/quant.py)
        self.quant = str(config.testing.get("quant", "none") or "none")
        if self.quant not in ("none", "int8"):
            raise ValueError(f"testing.quant={self.quant!r}: use none|int8")
        self._quant_rt = (self._build_quant_runtime(compute_dtype)
                          if self.quant == "int8" else None)

        if config.testing.get("describe_data", False):
            self.describe_data()

    def _build_quant_runtime(self, compute_dtype):
        from types import SimpleNamespace

        from ..models import dict_models
        from ..serving import quantized_model_config

        model_cfg = (self.config.model.to_dict()
                     if hasattr(self.config.model, "to_dict")
                     else dict(self.config.model))

        # testing.quant=int8 quantizes the FE branches AND the FeaT dense
        # stacks (serving.py's "int8-all"); calib builds the recording
        # graph over the same set of sites
        m_cal = dict_models[model_cfg["name"]](
            config=quantized_model_config(model_cfg, "calib"),
            compute_dtype=compute_dtype)
        m_q = dict_models[model_cfg["name"]](
            config=quantized_model_config(model_cfg, "int8-all"),
            compute_dtype=compute_dtype)
        # the int8 serving regime also takes the bf16-dot fast downscale
        # (ops.resize.interpolate_fast; error is dominated by activation
        # quantization) — the exact f32 chain stays on the non-quant path
        preproc = make_preprocess_fn(self.modals, self.trainer.downscale,
                                     train=False, fast=True)
        loss_fn = self.trainer.loss_fn

        @jax.jit
        def calibrate(params, batch_stats, xs):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            _, muts = m_cal.apply(variables, *preproc(xs), train=False,
                                  mutable=["quant_acts"])
            return muts["quant_acts"]

        @jax.jit
        def eval_step(params, batch_stats, quant_acts, xs, ys):
            variables = {"params": params, "quant_acts": quant_acts}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = m_q.apply(variables, *preproc(xs), train=False)
            logits = out["main"] if isinstance(out, dict) else out
            return loss_fn(logits, ys), jax.nn.softmax(logits, axis=-1)

        return SimpleNamespace(calibrate=calibrate, eval_step=eval_step)

    def describe_data(self, subsets=("sel",)) -> dict:
        """Variable-distribution summary per subset
        (parity with eval_prog_fus.py:89-134)."""
        out = {}
        for subset in subsets:
            df = self.trainer.datasets[f"{subset}_df"]
            df_subj = df.drop_duplicates(subset=[("-", "patient")])
            summary = {
                "n_subjects": len(df_subj),
                "n_knees": len(df),
                "AGE": df_subj[("-", "AGE")].describe().to_dict(),
                "P01BMI": df_subj[("-", "P01BMI")].describe().to_dict(),
                "P02SEX": df_subj[("-", "P02SEX")].value_counts().to_dict(),
                "WOMTS-": df[("-", "WOMTS-")].describe().to_dict(),
                "XRKL": df[("-", "XRKL")].value_counts().to_dict(),
                "P01INJ-": df[("-", "P01INJ-")].value_counts().to_dict(),
                "P01KSURG-": df[("-", "P01KSURG-")].value_counts().to_dict(),
            }
            if ("-", "target") in df.columns:
                summary["target"] = df[("-", "target")].value_counts().to_dict()
            logger.info(f"describe_data[{subset}]: {summary}")
            out[subset] = summary
        return out

    # ------------------------------------------------------------------

    def _restore_fold(self, fold_idx: int):
        path_fold = self.path_weights / "prog" / f"fold_{fold_idx}"
        handler = make_checkpoint_handler(
            path_fold,
            backend=self.config.training.get("ckpt_backend", "msgpack"))
        path_ckpt = handler.get_last_ckpt()
        if path_ckpt is None:
            raise FileNotFoundError(f"No checkpoint in {path_fold}")
        from .state import state_to_serializable
        payload = load_ckpt(path_ckpt,
                            target=state_to_serializable(self.trainer.state))
        return payload["params"], payload["batch_stats"]

    def eval_epoch(self, params, batch_stats) -> dict:
        """Test predictions with optional time/compute profiling
        (eval_prog_fus.py:250-317)."""
        acc: dict = {"exam_knee_id": [], "target": [], "predict": [],
                     "predict_proba": []}
        profile = self.config.testing.get("profile", "none")

        eval_step = self.trainer._eval_step
        loader = self.trainer.loaders["test"]
        quant_acts = None

        trace_ctx = None
        if profile == "trace":
            trace_dir = str(self.path_logs / "jax_trace")
            trace_ctx = jax.profiler.trace(trace_dir)
            trace_ctx.__enter__()
            logger.info(f"Writing jax.profiler trace to {trace_dir}")

        batch_times: list = []
        batch_valid: list = []
        warmed_up = False
        for batch in loader.epoch(0):
            xs = _modality_xs(batch, self.modals)
            ys = batch["target"][:, 0]
            n_valid = batch["_n_valid"]

            if self._quant_rt is not None and quant_acts is None:
                # small calibration slice: amax is batch-size-insensitive
                # and the calib graph's |x| reductions pin full
                # activations in HBM at large batches
                xs_cal = tuple(x[:min(16, x.shape[0])] for x in xs)
                quant_acts = self._quant_rt.calibrate(params, batch_stats,
                                                      xs_cal)
                rt = self._quant_rt

                def eval_step(p, s, x, y, _rt=rt, _qa=quant_acts):
                    return _rt.eval_step(p, s, _qa, x, y)

            if profile == "compute":
                # thop-equivalent: MACs via XLA cost analysis + param count
                # (reference: eval_prog_fus.py:280-285)
                lowered = jax.jit(
                    lambda p, s, x, y: eval_step(p, s, x, y)).lower(
                    params, batch_stats, xs, ys)
                cost = lowered.compile().cost_analysis()
                n_params = sum(int(np.prod(p.shape)) for p in
                               jax.tree_util.tree_leaves(params))
                flops = float(cost.get("flops", float("nan")))
                logger.info(
                    f"XLA cost analysis: flops={flops:.3e} "
                    f"(~{flops / 2 / max(1, int(n_valid)):.3e} MACs/sample) "
                    f"bytes={cost.get('bytes accessed', 0):.3e} "
                    f"params={n_params:.3e}")
                return {"profile_compute": dict(cost), "num_params": n_params}

            if profile == "time" and not warmed_up:
                # jit compile + cache warm on the first batch, excluded
                # from the timing (reference times steady-state batches,
                # eval_prog_fus.py:286-294)
                np.asarray(eval_step(params, batch_stats, xs, ys)[1])
                warmed_up = True
            t0 = time.perf_counter()
            loss, probs = eval_step(params, batch_stats, xs, ys)
            # host materialization is the completion barrier (through the
            # remote-TPU tunnel block_until_ready returns at enqueue)
            probs = np.asarray(jax.block_until_ready(probs))
            if profile == "time":
                batch_times.append(time.perf_counter() - t0)
                batch_valid.append(int(n_valid))

            probs = probs[:n_valid]
            acc["exam_knee_id"].extend(batch["exam_knee_id"][:n_valid])
            acc["target"].extend(np.asarray(ys)[:n_valid].tolist())
            acc["predict"].extend(np.argmax(probs, axis=1).tolist())
            acc["predict_proba"].extend(probs.tolist())

        if trace_ctx is not None:
            trace_ctx.__exit__(None, None, None)
        if profile == "time" and batch_times:
            # per-knee latency = materialized batch wall / valid knees in
            # the batch (padded work is charged to the real samples);
            # p50/p95 are over batches (BASELINE.json asks for p50)
            per_knee = (np.asarray(batch_times) /
                        np.maximum(np.asarray(batch_valid), 1))
            acc["time_per_sample"] = float(np.mean(per_knee))
            acc["time_per_sample_p50"] = float(np.percentile(per_knee, 50))
            acc["time_per_sample_p95"] = float(np.percentile(per_knee, 95))
            logger.info(
                f"Inference time per sample: mean={np.mean(per_knee):.6f}s "
                f"p50={np.percentile(per_knee, 50):.6f}s "
                f"p95={np.percentile(per_knee, 95):.6f}s "
                f"({len(batch_times)} batches, warmup excluded)")
        return acc

    def ensemble_eval_foldw(self, raw_foldw: dict) -> dict:
        """Merge fold predictions on exam_knee_id; mean probs → softmax
        (double-softmax parity, eval_prog_fus.py:319-343)."""
        dfs = []
        for fold_idx, d in raw_foldw.items():
            d = {k: v for k, v in d.items() if k != "time_per_sample"}
            t = pd.DataFrame.from_dict(d)
            t = t.rename(columns={
                "predict": f"predict__{fold_idx}",
                "predict_proba": f"predict_proba__{fold_idx}"})
            dfs.append(t)
        dfs[1:] = [e.drop(columns="target") for e in dfs[1:]]
        df_ens = functools.reduce(
            lambda lhs, rhs: pd.merge(lhs, rhs, on=["exam_knee_id"],
                                      validate="1:1"), dfs)
        cols = [c for c in df_ens.columns if c.startswith("predict_proba__")]
        t = np.asarray(df_ens[cols].values.tolist())  # samples×folds×classes
        t = softmax(np.mean(t, axis=1), axis=-1)
        df_ens["predict_proba"] = t.tolist()
        df_ens["predict"] = np.argmax(t, axis=-1).tolist()
        return df_ens.to_dict(orient="list")

    def eval(self) -> dict:
        paths_cache = {
            "raw_fold-w": self.path_logs / "eval_fus_raw_foldw.pkl",
            "raw_ens": self.path_logs / "eval_fus_raw_ens.pkl",
            "metrics_fold-w": self.path_logs / "eval_fus_metrics_foldw.pkl",
            "metrics_ens": self.path_logs / "eval_fus_metrics_ens.pkl",
        }
        use_cached = bool(self.config.testing.get("use_cached", False))

        if use_cached and paths_cache["raw_fold-w"].exists():
            raw_foldw = pickle.loads(paths_cache["raw_fold-w"].read_bytes())
        else:
            raw_foldw = {}
            for fold_idx in self.fold_idcs:
                params, batch_stats = self._restore_fold(fold_idx)
                raw_foldw[fold_idx] = self.eval_epoch(params, batch_stats)
            paths_cache["raw_fold-w"].write_bytes(
                pickle.dumps(raw_foldw, pickle.HIGHEST_PROTOCOL))

        results = {"raw_foldw": raw_foldw}

        if self.config.testing.get("metrics_foldw", True):
            metrics_foldw = {
                fold_idx: calc_metrics_v2(
                    prog_target=np.asarray(raw_foldw[fold_idx]["target"]),
                    prog_pred_proba=np.asarray(
                        raw_foldw[fold_idx]["predict_proba"]),
                    target=self.config.data.target)
                for fold_idx in self.fold_idcs if fold_idx in raw_foldw}
            paths_cache["metrics_fold-w"].write_bytes(
                pickle.dumps(metrics_foldw, pickle.HIGHEST_PROTOCOL))
            results["metrics_foldw"] = metrics_foldw
            for fold_idx, m in metrics_foldw.items():
                logger.info(f"Fold {fold_idx}: roc_auc={m['roc_auc']} "
                            f"avg_precision={m['avg_precision']}")

        if self.config.testing.get("ensemble_foldw", True) and raw_foldw:
            if use_cached and paths_cache["raw_ens"].exists():
                raw_ens = pickle.loads(paths_cache["raw_ens"].read_bytes())
            else:
                raw_ens = self.ensemble_eval_foldw(raw_foldw)
                paths_cache["raw_ens"].write_bytes(
                    pickle.dumps(raw_ens, pickle.HIGHEST_PROTOCOL))
            results["raw_ens"] = raw_ens

            if self.config.testing.get("metrics_ensemble", True):
                metrics_ens = calc_metrics_v2(
                    prog_target=np.asarray(raw_ens["target"]),
                    prog_pred_proba=np.asarray(raw_ens["predict_proba"]),
                    target=self.config.data.target)
                paths_cache["metrics_ens"].write_bytes(
                    pickle.dumps(metrics_ens, pickle.HIGHEST_PROTOCOL))
                results["metrics_ens"] = metrics_ens
                logger.info(f"Ensemble: roc_auc={metrics_ens['roc_auc']} "
                            f"avg_precision={metrics_ens['avg_precision']}")
        return results

    # ------------------------------------------------------------------
    # Explanation: whole-modality ablation
    # ------------------------------------------------------------------

    def _build_explain_step(self):
        model = self.trainer.model
        preproc = make_preprocess_fn(self.modals, self.trainer.downscale,
                                     train=False)
        n_modals = len(self.modals)

        def logits_of(params, batch_stats, xs):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, *xs, train=False)
            return out["main"] if isinstance(out, dict) else out

        def explain_step(params, batch_stats, xs, ys):
            xs = preproc(xs)
            base = logits_of(params, batch_stats, xs)
            base_t = jnp.take_along_axis(base, ys[:, None], axis=1)[:, 0]
            attrs = []
            for m in range(n_modals):
                xs_abl = tuple(jnp.zeros_like(x) if i == m else x
                               for i, x in enumerate(xs))
                abl = logits_of(params, batch_stats, xs_abl)
                abl_t = jnp.take_along_axis(abl, ys[:, None], axis=1)[:, 0]
                attrs.append(base_t - abl_t)
            return jnp.stack(attrs, axis=1)  # (B, n_modals)

        return jax.jit(explain_step)

    def explain_epoch(self, params, batch_stats) -> dict:
        explain_step = self._build_explain_step()
        acc: dict = {"exam_knee_id": [], "target": [], "modal_names": [],
                     "modal_abl_attrs": [], "modal_abl_percent": []}
        for batch in self.trainer.loaders["test"].epoch(0):
            xs = _modality_xs(batch, self.modals)
            ys = batch["target"][:, 0]
            n_valid = batch["_n_valid"]
            attrs = np.asarray(explain_step(params, batch_stats, xs,
                                            ys))[:n_valid]
            norm = attrs / np.sum(np.abs(attrs), axis=1, keepdims=True)
            percent = np.round(np.abs(norm) * 100.0, decimals=3)

            acc["exam_knee_id"].extend(batch["exam_knee_id"][:n_valid])
            acc["target"].extend(np.asarray(ys)[:n_valid].tolist())
            acc["modal_names"].extend([list(self.modals)] * int(n_valid))
            acc["modal_abl_attrs"].extend(attrs.tolist())
            acc["modal_abl_percent"].extend(percent.tolist())
        return acc

    def ensemble_explain_foldw(self, raw_foldw: dict) -> dict:
        dfs = []
        for fold_idx, d in raw_foldw.items():
            t = pd.DataFrame.from_dict(d)
            t = t.rename(columns={
                "modal_abl_attrs": f"modal_abl_attrs__{fold_idx}",
                "modal_abl_percent": f"modal_abl_percent__{fold_idx}"})
            dfs.append(t)
        for field in ("target", "modal_names"):
            dfs[1:] = [e.drop(columns=field) for e in dfs[1:]]
        df_ens = functools.reduce(
            lambda lhs, rhs: pd.merge(lhs, rhs, on=["exam_knee_id"],
                                      validate="1:1"), dfs)
        cols = [c for c in df_ens.columns
                if c.startswith("modal_abl_percent__")]
        t = np.asarray(df_ens[cols].values.tolist())
        t = np.mean(t, axis=1)
        t = t / np.sum(t, axis=1, keepdims=True)
        df_ens["modal_abl_percent"] = t.tolist()
        return df_ens.to_dict(orient="list")

    def explain(self) -> dict:
        assert self.config.testing.explain_fn == "modal_abl", \
            f"Unknown explain_fn: {self.config.testing.explain_fn}"
        paths_cache = {
            "raw_fold-w": self.path_logs / "explain_fus_raw_foldw.pkl",
            "raw_ens": self.path_logs / "explain_fus_raw_ens.pkl",
        }
        use_cached = bool(self.config.testing.get("use_cached", False))
        if use_cached and paths_cache["raw_fold-w"].exists():
            raw_foldw = pickle.loads(paths_cache["raw_fold-w"].read_bytes())
        else:
            raw_foldw = {}
            for fold_idx in self.fold_idcs:
                params, batch_stats = self._restore_fold(fold_idx)
                raw_foldw[fold_idx] = self.explain_epoch(params, batch_stats)
            paths_cache["raw_fold-w"].write_bytes(
                pickle.dumps(raw_foldw, pickle.HIGHEST_PROTOCOL))

        results = {"raw_foldw": raw_foldw}
        if self.config.testing.get("ensemble_foldw", True) and raw_foldw:
            raw_ens = self.ensemble_explain_foldw(raw_foldw)
            paths_cache["raw_ens"].write_bytes(
                pickle.dumps(raw_ens, pickle.HIGHEST_PROTOCOL))
            results["raw_ens"] = raw_ens
        return results
