"""Offline serving bundles: calibrate once, serve many.

The evaluator's ``testing.quant=int8`` path re-calibrates activation
scales on the first test batch of EVERY eval run
(train/evaluator.py:79-131). Production serving wants calibration as an
OFFLINE step: compute the ``quant_acts`` amax scales once from a trained
checkpoint plus a handful of calibration batches, then ship a
self-contained artifact that a serving process can load and run without
touching the training config tree. bench.py already follows that
contract with its committed calib cache; this module makes it a
first-class API.

The reference has no serving surface beyond eval
(koafusion/run/eval_prog_fus.py) — this is TPU-deployment capability the
rebuild adds on top of parity. Quantization semantics live in
ops/quant.py (int8 activation residency; per-channel weight scales
computed at apply time, so the parameter payload stays the plain f32
checkpoint tree).

Bundle layout (a directory)::

    bundle.json      — meta: model config (quant-injected), modals,
                       downscale, quant mode, dtypes, provenance
    bundle.msgpack   — flax-msgpack variables: params [+ batch_stats]
                       [+ quant_acts]

Use :func:`export_serving_bundle` to write one and
:func:`load_serving_bundle` to get a ready-to-jit predict function.
"""

from __future__ import annotations

import copy
import json
import logging
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

logger = logging.getLogger("serving")

BUNDLE_FORMAT = "oaprog-serving-bundle"
BUNDLE_VERSION = 1
QUANT_MODES = ("none", "int8", "int8-all")


def quantized_model_config(model_cfg: dict, mode: str,
                           include_agg: bool = True,
                           calib_pct: float | None = None) -> dict:
    """Deep-copied model config with the quant knob injected.

    ``mode`` is a serving mode ("none" | "int8" | "int8-all") or the
    internal graph mode "calib" (records amaxes instead of consuming
    them). FE branches get ``quant`` whether the ``fe`` node is flat
    (single-branch families) or nested per-branch (fusion families);
    the FeaT aggregator gets it only for "int8-all" (or "calib" with
    ``include_agg``). ``calib_pct`` (calib mode only) switches the
    recorded statistic from absolute max to that percentile of |x|
    (outlier-clipping calibration, ops/quant.py::_calib_stat).
    """
    cfg = copy.deepcopy(
        model_cfg.to_dict() if hasattr(model_cfg, "to_dict")
        else dict(model_cfg))
    if mode in ("none", "", None):
        return cfg
    if mode == "calib":
        fe_mode = f"calib:p{calib_pct}" if calib_pct else "calib"
    else:
        fe_mode = "int8"
    fe = cfg.get("fe") or {}
    if "arch" in fe:
        fe["quant"] = fe_mode
    else:
        for v in fe.values():
            if isinstance(v, dict) and "arch" in v:
                v["quant"] = fe_mode
    if (include_agg and mode in ("int8-all", "calib")
            and isinstance(cfg.get("agg"), dict) and "depth" in cfg["agg"]):
        cfg["agg"]["quant"] = fe_mode
    return cfg


def calibrate_quant_acts(calib_model, preproc, variables, batches,
                         max_calib_batch: int = 16):
    """Run the calibration graph over ``batches`` (iterable of xs
    tuples), accumulating running amax across batches.

    ops.quant.act_quant keeps ``amax = max(amax, |x|.max())`` in the
    ``quant_acts`` collection, so feeding each batch's mutated collection
    into the next apply yields the max over all batches. Batches are
    truncated to ``max_calib_batch`` samples: amax is batch-size
    insensitive while the calib graph's |x| reductions pin full
    activations in HBM (bench.py:220-223).
    """

    @jax.jit
    def one_batch(variables, xs):
        _, muts = calib_model.apply(variables, *preproc(xs), train=False,
                                    mutable=["quant_acts"])
        return muts["quant_acts"]

    base = {k: v for k, v in variables.items() if k != "quant_acts"}
    quant_acts = None
    n = 0
    for xs in batches:
        xs = tuple(jnp.asarray(x[:max_calib_batch]) for x in xs)
        v = dict(base)
        if quant_acts is not None:
            v["quant_acts"] = quant_acts
        quant_acts = one_batch(v, xs)
        n += 1
    if quant_acts is None:
        raise ValueError("calibration needs at least one batch")
    logger.info(f"calibrated {len(jax.tree_util.tree_leaves(quant_acts))} "
                f"activation scales over {n} batches")
    return quant_acts


def export_serving_bundle(path_out, model_cfg: dict, modals, downscale,
                          variables: dict, calib_batches=None,
                          quant: str = "int8-all",
                          compute_dtype=jnp.bfloat16,
                          source: str = "") -> dict:
    """Write a serving bundle directory; returns the meta dict.

    ``variables``: the trained {"params": ..., ["batch_stats": ...]}
    tree (a checkpoint payload). ``calib_batches``: iterable of xs
    tuples (one array per modality, raw pre-preproc values as the host
    pipeline ships them) — required for the int8 modes.
    """
    from .models import dict_models

    if quant not in QUANT_MODES:
        raise ValueError(f"quant={quant!r}: use one of {QUANT_MODES}")
    path_out = Path(path_out)
    path_out.mkdir(parents=True, exist_ok=True)

    from .train.trainer import make_preprocess_fn
    use_quant = quant.startswith("int8")
    preproc = make_preprocess_fn(list(modals), downscale, train=False,
                                 fast=use_quant)

    payload = {"params": variables["params"]}
    if variables.get("batch_stats"):
        payload["batch_stats"] = variables["batch_stats"]

    n_calib = 0
    if use_quant:
        if calib_batches is None:
            raise ValueError("int8 export requires calibration batches")
        calib_cfg = quantized_model_config(
            model_cfg, "calib", include_agg=(quant == "int8-all"))
        calib_model = dict_models[calib_cfg["name"]](
            config=calib_cfg, compute_dtype=compute_dtype)
        batches = list(calib_batches)
        n_calib = len(batches)
        payload["quant_acts"] = jax.device_get(
            calibrate_quant_acts(calib_model, preproc, payload, batches))

    serve_cfg = quantized_model_config(model_cfg, quant)
    meta = {
        "format": BUNDLE_FORMAT,
        "version": BUNDLE_VERSION,
        "quant": quant,
        "model": serve_cfg,
        "modals": list(modals),
        "downscale": ([list(d) if isinstance(d, (list, tuple)) else d
                       for d in downscale] if downscale else None),
        "compute_dtype": np.dtype(compute_dtype).name,
        "calib_batches": n_calib,
        "source": str(source),
    }
    payload = jax.device_get(payload)
    (path_out / "bundle.msgpack").write_bytes(
        serialization.msgpack_serialize(payload))
    with open(path_out / "bundle.json", "w") as f:
        json.dump(meta, f, indent=1)
    logger.info(f"serving bundle written to {path_out} (quant={quant})")
    return meta


def load_serving_bundle(path, jit: bool = True) -> SimpleNamespace:
    """Load a bundle; returns (model, variables, preproc, predict, meta).

    ``predict(xs)`` maps the raw per-modality input tuple to class
    probabilities — the same device work bench.py times (preproc +
    forward + softmax), jitted unless ``jit=False``.
    """
    from .models import dict_models
    from .train.trainer import make_preprocess_fn

    path = Path(path)
    with open(path / "bundle.json") as f:
        meta = json.load(f)
    if meta.get("format") != BUNDLE_FORMAT:
        raise ValueError(f"{path}: not a {BUNDLE_FORMAT}")
    if int(meta.get("version", 0)) > BUNDLE_VERSION:
        raise ValueError(f"{path}: bundle version {meta['version']} newer "
                         f"than supported {BUNDLE_VERSION}")

    variables = serialization.msgpack_restore(
        (path / "bundle.msgpack").read_bytes())
    quant = meta["quant"]
    if quant.startswith("int8") and "quant_acts" not in variables:
        raise ValueError(f"{path}: quant={quant} bundle lacks quant_acts")

    compute_dtype = jnp.dtype(meta["compute_dtype"])
    model = dict_models[meta["model"]["name"]](config=meta["model"],
                                               compute_dtype=compute_dtype)
    preproc = make_preprocess_fn(meta["modals"], meta["downscale"],
                                 train=False,
                                 fast=quant.startswith("int8"))

    def predict(variables, xs):
        out = model.apply(variables, *preproc(xs), train=False)
        logits = out["main"] if isinstance(out, dict) else out
        return jax.nn.softmax(logits, axis=-1)

    return SimpleNamespace(model=model, variables=variables,
                           preproc=preproc, meta=meta,
                           predict=jax.jit(predict) if jit else predict)
