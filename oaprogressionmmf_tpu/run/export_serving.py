"""CLI: export calibrated serving bundles from trained checkpoints —
`python -m oaprogressionmmf_tpu.run.export_serving`.

No reference counterpart (koafusion stops at eval); this productionizes
the int8 serving path (ops/quant.py, serving.py): per requested fold,
restore the rolling-best checkpoint, calibrate activation amax scales on
``serving.calib_batches`` validation batches, and write a self-contained
bundle under ``{path_experiment_root}/serving/fold_{idx}`` (or
``serving.out``). Serve with::

    from oaprogressionmmf_tpu.serving import load_serving_bundle
    b = load_serving_bundle(path)
    probs = b.predict(b.variables, xs)

Config knobs (prog_fus.yaml ``serving`` group): ``quant`` ∈
{none, int8, int8-all}, ``calib_batches``, ``out``.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from ..config import load_config
from ..utils.seeding import set_ultimate_seed

logger = logging.getLogger("export_serving")

CONF_DIR = Path(__file__).parent / "conf"


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = load_config(CONF_DIR / "prog_fus.yaml", argv)

    logging.basicConfig(level=logging.INFO)
    set_ultimate_seed()
    run(config)


def run(config) -> list:
    """Export bundles for every requested fold; returns the bundle paths."""
    import jax.numpy as jnp

    from ..serving import export_serving_bundle
    from ..train.evaluator import ProgressionEvaluator
    from ..train.trainer import _modality_xs

    serving_cfg = config.get("serving", {}) or {}
    get = (serving_cfg.get if hasattr(serving_cfg, "get")
           else lambda k, d=None: d)
    quant = str(get("quant", "int8-all") or "int8-all")
    n_calib = int(get("calib_batches", 2) or 2)
    out_root = get("out") or str(
        Path(config.path_experiment_root) / "serving")

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        config.get("runtime", {}).get("compute_dtype", "bfloat16")
        if hasattr(config.get("runtime", {}), "get") else "bfloat16"]

    ev = ProgressionEvaluator(config, compute_dtype=dtype)
    model_cfg = (config.model.to_dict()
                 if hasattr(config.model, "to_dict")
                 else dict(config.model))

    # calibration batches come from the fold's VALIDATION split (the
    # test set stays untouched; amax is data-distribution, not
    # label, sensitive)
    batches = []
    for batch in ev.trainer.loaders["val"].epoch(0):
        batches.append(_modality_xs(batch, ev.modals))
        if len(batches) >= n_calib:
            break

    paths = []
    for fold_idx in ev.fold_idcs:
        params, batch_stats = ev._restore_fold(fold_idx)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = Path(out_root) / f"fold_{fold_idx}"
        meta = export_serving_bundle(
            out, model_cfg, ev.modals, ev.trainer.downscale, variables,
            calib_batches=batches, quant=quant, compute_dtype=dtype,
            source=f"{config.path_experiment_root} fold_{fold_idx}")
        logger.info(f"fold {fold_idx}: bundle at {out} "
                    f"(quant={meta['quant']}, "
                    f"calib_batches={meta['calib_batches']})")
        paths.append(out)
    return paths


if __name__ == "__main__":
    main()
