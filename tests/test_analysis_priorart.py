"""Analysis utilities + prior-art label derivation tests."""

import numpy as np
import pandas as pd
import pytest

from oaprogressionmmf_tpu import analysis as A
from oaprogressionmmf_tpu.prior_art import (build_clinical,
                                            build_img_progression_meta)


def test_paired_permutation_detects_better_model():
    rng = np.random.RandomState(0)
    n = 300
    y = (rng.rand(n) < 0.3).astype(int)
    good = np.clip(0.6 * y + 0.35 * rng.rand(n), 0, 1)
    bad = rng.rand(n)
    out = A.paired_permutation_test(y, good, bad, n_resamples=200, seed=0)
    assert out["statistic__roc_auc"] > 0.2
    assert out["pvalue__roc_auc"] < 0.05


def test_paired_permutation_null_is_insignificant():
    rng = np.random.RandomState(1)
    n = 300
    y = (rng.rand(n) < 0.3).astype(int)
    a = np.clip(0.4 * y + 0.4 * rng.rand(n), 0, 1)
    b = a + rng.randn(n) * 0.01  # nearly identical model
    out = A.paired_permutation_test(y, a, b, n_resamples=200, seed=0)
    assert out["pvalue__roc_auc"] > 0.05


def test_metrics_for_experiment_bootstrap_fields():
    rng = np.random.RandomState(2)
    n = 200
    y = (rng.rand(n) < 0.3).astype(int)
    p = np.clip(0.4 * y + 0.4 * rng.rand(n), 0, 1)
    proba = np.stack([1 - p, p], axis=1)
    out = A.metrics_for_experiment(y, proba, "prog_kl_48",
                                   n_bootstrap=50)
    assert "roc_auc__bs" in out
    bs = out["roc_auc__bs"]
    assert bs["ci_low"] <= bs["value"] <= bs["ci_high"]


def test_modality_utilization_summary():
    raw = {"modal_names": [["xr_pa", "sag_3d_dess"]] * 3,
           "modal_abl_percent": [[70.0, 30.0], [60.0, 40.0], [80.0, 20.0]]}
    df = A.modality_utilization_summary(raw)
    np.testing.assert_allclose(df["mean_percent"], [70.0, 30.0])


def _write_kxr(tmp_path, code, rows):
    df = pd.DataFrame(rows, columns=["ID", "SIDE", f"V{code}XRKL"])
    df.to_csv(tmp_path / f"kxr_sq_bu{code}.csv", index=False)


def test_build_img_progression_meta(tmp_path):
    # knee 1/R: KL1 baseline → KL2 at 12m  => early progressor (code 1)
    # knee 2/R: KL1 stable throughout      => non-progressor (0)
    # knee 3/R: KL0 → TKR (missing KL) at 96m => late progressor (2)
    # knee 4/R: KL4 at baseline            => excluded
    _write_kxr(tmp_path, "00", [(1, 1, 1), (2, 1, 1), (3, 1, 0), (4, 1, 4)])
    _write_kxr(tmp_path, "01", [(1, 1, 2), (2, 1, 1), (3, 1, 0)])
    _write_kxr(tmp_path, "03", [(1, 1, 2), (2, 1, 1), (3, 1, 0)])
    _write_kxr(tmp_path, "05", [(1, 1, 2), (2, 1, 1), (3, 1, 0)])
    _write_kxr(tmp_path, "08", [(1, 1, 2), (2, 1, 1), (3, 1, 0)])
    _write_kxr(tmp_path, "10", [(1, 1, 2), (2, 1, 1), (3, 1, None)])
    out = build_img_progression_meta(tmp_path).set_index("ID")
    assert out.loc[1, "Progressor"] == 1
    assert out.loc[2, "Progressor"] == 0
    assert out.loc[3, "Progressor"] == 2
    assert 4 not in out.index
    assert out.loc[3, "Prog_increase"] == 5  # TKR coded as KL 5


def test_build_img_progression_kl_to_1_ignored(tmp_path):
    # KL0 → KL1 transitions never count as progression
    _write_kxr(tmp_path, "00", [(1, 1, 0)])
    for code in ("01", "03", "05", "08", "10"):
        _write_kxr(tmp_path, code, [(1, 1, 1)])
    out = build_img_progression_meta(tmp_path)
    assert out.loc[0, "Progressor"] == 0


def test_build_clinical(tmp_path):
    pd.DataFrame({"ID": [1, 2], "P02SEX": [1, 2]}).to_csv(
        tmp_path / "enrollees.csv", index=False)
    pd.DataFrame({
        "ID": [1, 2], "V00AGE": [60, 70], "P01BMI": [25.0, 30.0],
        "P01INJL": [0, 1], "P01INJR": [1, 0],
        "P01KSURGL": [0, 0], "P01KSURGR": [0, 1],
        "V00WOMTSL": [5.0, 10.0], "V00WOMTSR": [6.0, 11.0],
    }).to_csv(tmp_path / "allclinical00.csv", index=False)
    out = build_clinical(tmp_path)
    assert len(out) == 4  # 2 patients x 2 sides
    assert set(out.columns) == {"ID", "Side", "AGE", "SEX", "BMI", "INJ",
                                "SURG", "WOMAC"}
    left1 = out[(out.ID == 1) & (out.Side == "L")].iloc[0]
    assert left1["INJ"] == 0 and left1["WOMAC"] == 5.0
    assert left1["SEX"] == 1  # 2 - P02SEX


def test_radar_table_and_plot():
    metrics = {"XR1Cnn": {"roc_auc": 0.7, "avg_precision": 0.4,
                          "avg_ppv_calib": 0.3, "avg_npv": 0.9,
                          "b_accuracy": 0.65},
               "XR1MR2C1CnnTrf": {"roc_auc": 0.78, "avg_precision": 0.5,
                                  "avg_ppv_calib": 0.38, "avg_npv": 0.93,
                                  "b_accuracy": 0.7}}
    df = A.radar_table(metrics)
    assert list(df.index) == ["XR1Cnn", "XR1MR2C1CnnTrf"]
    ax = A.plot_radar(df, title="test")
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_modality_utilization():
    raw = {"modal_names": [["xr_pa", "clin"]] * 2,
           "modal_abl_percent": [[80.0, 20.0], [70.0, 30.0]]}
    df = A.modality_utilization_summary(raw)
    ax = A.plot_modality_utilization(df, title="util")
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")
