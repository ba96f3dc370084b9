"""analyze_results CLI over synthetic prediction pickles."""

import pickle

import numpy as np
import pytest

from oaprogressionmmf_tpu.run.analyze_results import analyze, \
    discover_experiments


def _make_exp(root, exp_id, auc_quality, seed, n=120, with_explain=False):
    rng = np.random.RandomState(seed)
    # shared targets/ids across experiments (same test subset)
    rng_common = np.random.RandomState(0)
    y = (rng_common.rand(n) < 0.35).astype(int)
    ids = [f"9{i:06d}__000m__LEFT" for i in range(n)]
    p = np.clip(auc_quality * y + 0.4 * rng.rand(n), 0, 1)
    raw = {"exam_knee_id": ids,
           "target": [[int(t)] for t in y],
           "predict": (p > 0.5).astype(int).tolist(),
           "predict_proba": np.stack([1 - p, p], 1).tolist()}
    d = root / exp_id / "logs_eval" / "all"
    d.mkdir(parents=True, exist_ok=True)
    (d / "eval_fus_raw_ens.pkl").write_bytes(pickle.dumps(raw))
    if with_explain:
        ex = {"exam_knee_id": ids, "target": [[int(t)] for t in y],
              "modal_names": [["xr_pa", "sag_3d_dess"]] * n,
              "modal_abl_percent": np.abs(
                  rng.rand(n, 2) * [70, 30]).tolist(),
              "modal_abl_attrs": rng.randn(n, 2).tolist()}
        (d / "explain_fus_raw_ens.pkl").write_bytes(pickle.dumps(ex))


def test_analyze_end_to_end(tmp_path):
    results = tmp_path / "results"
    _make_exp(results, "xr1_cnn__prog_kl_48", 0.15, seed=1, with_explain=True)
    _make_exp(results, "xr1mr2c1_cnn_trf__prog_kl_48", 0.8, seed=2)
    _make_exp(results, "xr1_cnn__prog_kl_12", 0.15, seed=3)  # other target

    found = discover_experiments(results, "prog_kl_48")
    assert set(found) == {"xr1_cnn__prog_kl_48",
                          "xr1mr2c1_cnn_trf__prog_kl_48"}

    out = analyze(results, target="prog_kl_48", n_resamples=100,
                  n_bootstrap=30, with_figures=True)
    assert set(out["metrics"]) == set(found)
    # the stronger model must rank higher
    m = out["metrics"]
    assert (m["xr1mr2c1_cnn_trf__prog_kl_48"]["roc_auc"] >
            m["xr1_cnn__prog_kl_48"]["roc_auc"])
    # permutation test compared the two on common ids
    key = "xr1_cnn__prog_kl_48||xr1mr2c1_cnn_trf__prog_kl_48"
    assert key in out["permutation"]
    assert out["permutation"][key]["pvalue__roc_auc"] <= 1.0
    # artifacts
    out_dir = out["out_dir"]
    assert (out_dir / "metrics_table.csv").exists()
    assert (out_dir / "permutation_tests.json").exists()
    assert (out_dir / "radar.png").exists()
    assert (out_dir / "utilization__xr1_cnn__prog_kl_48.png").exists()


def test_analyze_empty_dir(tmp_path):
    assert analyze(tmp_path, with_figures=False) == {}


def test_analyze_utilization_by_horizon(tmp_path):
    """Same combo across prog_kl_* horizons → utilization-vs-horizon table
    + figure (Analysis_Visualization.ipynb 'Figure. Utilization')."""
    results = tmp_path / "results"
    for tgt, seed in [("prog_kl_12", 1), ("prog_kl_24", 2),
                      ("prog_kl_48", 3)]:
        _make_exp(results, f"xr1mr2c1_cnn_trf__{tgt}", 0.5, seed=seed,
                  with_explain=True)

    out = analyze(results, target=None, n_resamples=50, n_bootstrap=20,
                  with_figures=True)
    out_dir = out["out_dir"]
    csv = out_dir / "utilization_by_horizon__xr1mr2c1_cnn_trf.csv"
    png = out_dir / "utilization_by_horizon__xr1mr2c1_cnn_trf.png"
    assert csv.exists() and png.exists()
    import pandas as pd
    df = pd.read_csv(csv)
    assert set(df["timepoint"]) == {12, 24, 48}
    assert set(df["modality"]) == {"xr_pa", "sag_3d_dess"}
    assert ((df["percent"] >= 0) & (df["percent"] <= 1)).all()
