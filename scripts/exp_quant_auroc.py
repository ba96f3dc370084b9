"""Offline int8 quant-variant sweep at the AUROC level.

Loads a trained rehearsal state (OAPROG_REH_SAVE dump from
rehearse_training_parity.py), rebuilds the SAME synthetic cohort, and
evaluates the test set through quantized serving graphs under several
calibration variants — without retraining (eval-only, minutes per
variant):

    f32 (baseline) | bf16 | {int8, int8-all} x {absmax, p99.9, p99.99}
    x calib batches {2, 8}

Usage:
    OAPROG_REH_SIGNAL=3.0 OAPROG_REH_AMPNOISE=18.0 OAPROG_REH_BATCH=16 \
    OAPROG_REH_NTEST=256 python scripts/exp_quant_auroc.py \
        rehearsal_r04_state_s0.msgpack flagship [out.jsonl]

The env knobs MUST match the run that produced the state dump (they pin
the cohort RNG streams). Supports the BASELINE.md north-star check:
>=10x serving throughput AND AUROC within 0.005.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STATE_PATH = sys.argv[1]
FAMILY = sys.argv[2] if len(sys.argv) > 2 else "flagship"
OUT = sys.argv[3] if len(sys.argv) > 3 else None

# import the rehearsal module for make_data/MODEL_CFGS/metrics — its
# module-level knobs read sys.argv/env, so pin argv to the family first
sys.argv = ["rehearse_training_parity.py", "1", FAMILY, "aug"]
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "reh", Path(__file__).parent / "rehearse_training_parity.py")
reh = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(reh)

import jax  # noqa: E402

# default cpu (deterministic, leaves the chip free); OAPROG_QSWEEP_BACKEND=tpu
# runs the serving graphs on the real chip (~4x faster sweep, and the
# backend the headline runs on). TPU = leave the env's axon platform as-is
# (setting the env var in-process is too late — see CLAUDE.md).
if os.environ.get("OAPROG_QSWEEP_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from oaprogressionmmf_tpu.models import dict_models  # noqa: E402
from oaprogressionmmf_tpu.serving import (calibrate_quant_acts,  # noqa: E402
                                          quantized_model_config)

BATCH = reh.BATCH
MODEL_CFG = reh.MODEL_CFGS[FAMILY]


def main():
    (_, _), (xs_va, y_va), (xs_te, y_te) = reh.make_data()
    payload = serialization.msgpack_restore(
        Path(STATE_PATH).read_bytes())
    base_vars = {"params": payload["params"]}
    if payload.get("batch_stats"):
        base_vars["batch_stats"] = payload["batch_stats"]

    def predict(mdl, vs):
        @jax.jit
        def step(vs, xb):
            out = mdl.apply(vs, *xb, train=False)
            logits = out["main"] if isinstance(out, dict) else out
            return jax.nn.softmax(logits, axis=-1)[:, 1]

        return np.concatenate(
            [np.asarray(step(vs, tuple(jnp.asarray(x[i:i + BATCH])
                                       for x in xs_te)))
             for i in range(0, len(xs_te[0]), BATCH)])

    results = []

    def record(tag, scores, secs):
        auc = reh.auroc(y_te, scores)
        ap = reh.average_precision(y_te, scores)
        row = {"variant": tag, "test_auc": round(float(auc), 4),
               "test_ap": round(float(ap), 4), "sec": round(secs, 1)}
        if results:
            row["dauc"] = round(float(auc - results[0]["test_auc"]), 4)
            row["dap"] = round(float(ap - results[0]["test_ap"]), 4)
        results.append(row)
        print(json.dumps(row), flush=True)

    t0 = time.time()
    m_f32 = dict_models[MODEL_CFG["name"]](config=dict(MODEL_CFG))
    with jax.default_matmul_precision("highest"):
        record("f32", predict(m_f32, base_vars), time.time() - t0)

    t0 = time.time()
    m_bf16 = dict_models[MODEL_CFG["name"]](config=dict(MODEL_CFG),
                                            compute_dtype=jnp.bfloat16)
    record("bf16", predict(m_bf16, base_vars), time.time() - t0)

    # the val set bounds the calibration data: n_calib batches are capped
    # to what it holds (production config: 64 val knees / batch 16 → the
    # "8-batch" arm becomes c4 = ALL val knees, vs c2 = 32)
    n_avail = max(1, len(xs_va[0]) // BATCH)
    for mode in ("int8", "int8-all"):
        for pct in (None, 99.9, 99.99):
            for n_calib in sorted({min(2, n_avail), min(8, n_avail)}):
                t0 = time.time()
                calib_cfg = quantized_model_config(
                    MODEL_CFG, "calib", include_agg=(mode == "int8-all"),
                    calib_pct=pct)
                m_cal = dict_models[calib_cfg["name"]](
                    config=calib_cfg, compute_dtype=jnp.bfloat16)
                calib = [tuple(x[i:i + BATCH] for x in xs_va)
                         for i in range(0, n_calib * BATCH, BATCH)]
                vs = dict(base_vars)
                vs["quant_acts"] = calibrate_quant_acts(
                    m_cal, lambda xs: xs, vs, calib)
                m_q = dict_models[MODEL_CFG["name"]](
                    config=quantized_model_config(MODEL_CFG, mode),
                    compute_dtype=jnp.bfloat16)
                tag = (f"{mode}|{'absmax' if pct is None else f'p{pct}'}"
                       f"|c{n_calib}")
                record(tag, predict(m_q, vs), time.time() - t0)

    if OUT:
        with open(OUT, "a") as f:
            meta = {"state": STATE_PATH, "family": FAMILY,
                    "n_test": len(y_te), "env": {
                        k: os.environ.get(k) for k in
                        ("OAPROG_REH_SIGNAL", "OAPROG_REH_AMPNOISE",
                         "OAPROG_REH_BATCH", "OAPROG_REH_NTEST")}}
            f.write(json.dumps({"meta": meta, "results": results}) + "\n")


if __name__ == "__main__":
    main()
