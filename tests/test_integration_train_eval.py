"""End-to-end integration: 1 fold × 1 epoch on a synthetic OAI tree,
then fold-wise eval + ensemble + explanation (SURVEY.md §4 implication)."""

import pickle

import numpy as np
import pytest

from synth_oai import build_synth_tree, make_synth_config


@pytest.fixture(scope="module")
def trained_experiment(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp")
    build_synth_tree(tmp / "data", n_patients=12, modals=("xr_pa",))
    config = make_synth_config(tmp, model_name="XR1Cnn", modals=("xr_pa",))

    from oaprogressionmmf_tpu.train.trainer import ProgressionTrainer
    summary = {}
    for fold_idx in range(2):
        trainer = ProgressionTrainer(config, fold_idx)
        summary[fold_idx] = trainer.fit()
    return tmp, config, summary


def test_training_produces_checkpoints_and_metrics(trained_experiment):
    tmp, config, summary = trained_experiment
    for fold_idx in range(2):
        ckpts = list((tmp / "results" / "weights" / "prog" /
                      f"fold_{fold_idx}").glob("*.ckpt"))
        assert len(ckpts) == 1, f"fold {fold_idx}: {ckpts}"
        assert ckpts[0].name.startswith("XR1Cnn__fold_")
        assert np.isfinite(summary[fold_idx]["best"])
    scalars = tmp / "results" / "logs_train" / "fold_0" / "scalars.jsonl"
    assert scalars.exists() and scalars.stat().st_size > 0


def test_eval_and_ensemble(trained_experiment):
    tmp, config, _ = trained_experiment
    from oaprogressionmmf_tpu.train.evaluator import ProgressionEvaluator

    config["testing"]["folds"] = {"idx": -1, "ignore": [2]}
    config["training"]["folds"]["num"] = 2  # only 2 folds trained
    ev = ProgressionEvaluator(config)
    results = ev.eval()

    raw = results["raw_foldw"]
    assert set(raw) == {0, 1}
    n_test = len(raw[0]["exam_knee_id"])
    assert n_test > 0
    assert len(raw[0]["predict_proba"][0]) == 2

    ens = results["raw_ens"]
    assert len(ens["exam_knee_id"]) == n_test
    # double-softmax ensemble keeps probabilities normalized
    np.testing.assert_allclose(
        np.asarray(ens["predict_proba"]).sum(axis=1), 1.0, atol=1e-5)

    # pickles on disk with the reference cache names (cohort subdir "all"
    # because sag_t2_map is not among modals_all)
    logs = tmp / "results" / "logs_eval" / "all"
    for name in ("eval_fus_raw_foldw.pkl", "eval_fus_raw_ens.pkl",
                 "eval_fus_metrics_foldw.pkl", "eval_fus_metrics_ens.pkl"):
        assert (logs / name).exists(), name

    metrics = pickle.loads((logs / "eval_fus_metrics_ens.pkl").read_bytes())
    assert "roc_auc" in metrics and "avg_ppv_calib" in metrics


def test_explain_modal_ablation(trained_experiment):
    tmp, config, _ = trained_experiment
    from oaprogressionmmf_tpu.train.evaluator import ProgressionEvaluator

    config["testing"]["folds"] = {"idx": 0, "ignore": None}
    config["training"]["folds"]["num"] = 2
    ev = ProgressionEvaluator(config)
    results = ev.explain()
    raw = results["raw_foldw"][0]
    percent = np.asarray(raw["modal_abl_percent"])
    # single modality -> 100% utilization
    np.testing.assert_allclose(percent, 100.0, atol=1e-3)
    assert raw["modal_names"][0] == ["xr_pa"]


def test_resume_restarts_from_checkpoint(trained_experiment):
    tmp, config, _ = trained_experiment
    from oaprogressionmmf_tpu.train.trainer import ProgressionTrainer
    trainer = ProgressionTrainer(config, fold_idx=0)
    # epoch 0 already trained and saved -> resume starts at epoch >= 1
    assert trainer.start_epoch >= 1


def test_export_and_load_serving_bundle(trained_experiment):
    """run/export_serving.py + serving.py: checkpoint -> calibrated
    offline int8 bundle -> loadable predict fn whose probabilities track
    the full-precision eval path (the evaluator's per-run calibration,
    made a shipped artifact)."""
    tmp, config, _ = trained_experiment
    from oaprogressionmmf_tpu.run.export_serving import run as export_run
    from oaprogressionmmf_tpu.serving import load_serving_bundle
    from oaprogressionmmf_tpu.train.evaluator import ProgressionEvaluator
    from oaprogressionmmf_tpu.train.trainer import _modality_xs

    config["testing"]["folds"] = {"idx": 0, "ignore": None}
    config["training"]["folds"]["num"] = 2
    config["testing"]["quant"] = "none"
    paths = export_run(config)
    assert len(paths) == 1
    meta = (paths[0] / "bundle.json").read_text()
    assert "oaprog-serving-bundle" in meta

    b = load_serving_bundle(paths[0])
    assert b.meta["quant"] == "int8-all"
    assert "quant_acts" in b.variables

    # full-precision reference predictions on the first test batch
    ev = ProgressionEvaluator(config)
    params, stats = ev._restore_fold(0)
    batch = next(iter(ev.trainer.loaders["test"].epoch(0)))
    xs = _modality_xs(batch, ev.modals)
    _, pb = ev.trainer._eval_step(params, stats, xs,
                                  batch["target"][:, 0])
    pq = np.asarray(b.predict(b.variables, xs))
    np.testing.assert_allclose(pq.sum(axis=1), 1.0, atol=1e-5)
    assert float(np.abs(pq - np.asarray(pb)).max()) < 0.05


def test_eval_profile_time_percentiles(trained_experiment):
    """profile=time reports warmup-excluded mean/p50/p95 per-knee latency
    (BASELINE.json asks for p50; VERDICT r1 weak #5)."""
    tmp, config, _ = trained_experiment
    from oaprogressionmmf_tpu.train.evaluator import ProgressionEvaluator

    config["testing"]["folds"] = {"idx": 0, "ignore": None}
    config["training"]["folds"]["num"] = 2
    config["testing"]["profile"] = "time"
    try:
        ev = ProgressionEvaluator(config)
        params, stats = ev._restore_fold(0)
        acc = ev.eval_epoch(params, stats)
    finally:
        config["testing"]["profile"] = "none"
    for k in ("time_per_sample", "time_per_sample_p50",
              "time_per_sample_p95"):
        assert k in acc and acc[k] > 0
    assert acc["time_per_sample_p50"] <= acc["time_per_sample_p95"]


def test_eval_int8_quant_serving(trained_experiment):
    """testing.quant=int8: per-fold calibration on the first test batch,
    quantized graph for eval — predictions stay close to the bf16/f32
    path (ops/quant.py serving quantization)."""
    from oaprogressionmmf_tpu.train.evaluator import ProgressionEvaluator

    tmp, config, _ = trained_experiment
    config["testing"]["folds"] = {"idx": 0, "ignore": []}
    config["training"]["folds"]["num"] = 2
    config["testing"]["use_cached"] = False

    ev = ProgressionEvaluator(config)
    params, stats = ev._restore_fold(0)
    base = ev.eval_epoch(params, stats)

    config["testing"]["quant"] = "int8"
    evq = ProgressionEvaluator(config)
    quant = evq.eval_epoch(params, stats)

    assert quant["exam_knee_id"] == base["exam_knee_id"]
    pb = np.asarray(base["predict_proba"])
    pq = np.asarray(quant["predict_proba"])
    assert pq.shape == pb.shape
    np.testing.assert_allclose(pq.sum(axis=1), 1.0, atol=1e-5)
    # int8 tracks the full-precision probabilities closely
    assert float(np.abs(pq - pb).max()) < 0.05
