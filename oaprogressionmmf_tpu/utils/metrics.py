"""The evaluation contract: calibrated metrics, bootstrap CIs, metric suite.

Numeric parity with the reference's evaluation machinery is required
(koafusion/various/_metrics_stat_anlys.py:83-216 and the vendored
calibrated-PR metrics in _metrics_wissam.py). The uncalibrated metrics are
delegated to sklearn exactly as the reference does (host-side, tiny arrays);
the prevalence-calibrated PR family is implemented here in numpy from the
published formulas (calibrated precision = tp / (tp + ratio*fp) with
ratio = pi*(1-pi0) / (pi0*(1-pi))).
"""

from __future__ import annotations

import copy

import numpy as np
from scipy import integrate
from sklearn.metrics import (
    average_precision_score, balanced_accuracy_score, precision_recall_curve,
    recall_score, roc_auc_score, roc_curve,
)

__all__ = [
    "roc_auc_score", "average_precision_score", "balanced_accuracy_score",
    "precision_recall_curve", "roc_curve",
    "precision_recall_curve_calib", "average_precision_score_calib",
    "f1score_calib", "bestf1score_calib",
    "avg_precision_at_recall_range", "calc_bootstrap", "calc_metrics_v2",
    "sensitivity_specificity_cutoff", "youdens_index", "mc_bacc",
]


# ---------------------------------------------------------------------------
# Prevalence-calibrated precision-recall family
# ---------------------------------------------------------------------------

def _binary_clf_curve(y_true, y_score, pos_label=1, sample_weight=None):
    """FP/TP counts per decreasing score threshold (numpy implementation)."""
    y_true = np.ravel(np.asarray(y_true))
    y_score = np.ravel(np.asarray(y_score))
    if y_true.shape != y_score.shape:
        raise ValueError("y_true and y_score must have the same shape")
    if not np.all(np.isfinite(y_score)):
        raise ValueError("y_score contains non-finite values")

    y_true = (y_true == pos_label)

    order = np.argsort(y_score, kind="mergesort")[::-1]
    y_score = y_score[order]
    y_true = y_true[order]
    weight = (np.ravel(np.asarray(sample_weight))[order]
              if sample_weight is not None else 1.0)

    distinct_idx = np.where(np.diff(y_score))[0]
    threshold_idxs = np.r_[distinct_idx, y_true.size - 1]

    tps = np.cumsum(y_true * weight)[threshold_idxs]
    if sample_weight is not None:
        fps = np.cumsum((1 - y_true) * weight)[threshold_idxs]
    else:
        fps = 1 + threshold_idxs - tps
    return fps, tps, y_score[threshold_idxs]


def precision_recall_curve_calib(y_true, y_pred, pos_label=1,
                                 sample_weight=None, pi0=None):
    """PR curve with precision calibrated to a reference prevalence ``pi0``."""
    fps, tps, thresholds = _binary_clf_curve(
        y_true, y_pred, pos_label=pos_label, sample_weight=sample_weight)

    if pi0 is not None:
        pi = np.sum(y_true) / float(np.asarray(y_true).shape[0])
        ratio = pi * (1 - pi0) / (pi0 * (1 - pi))
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = tps / (tps + ratio * fps)
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = tps / (tps + fps)
    precision[np.isnan(precision)] = 0

    recall = tps / tps[-1]

    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    return np.r_[precision[sl], 1], np.r_[recall[sl], 0], thresholds[sl]


def average_precision_score_calib(y_true, y_pred, pos_label=1,
                                  sample_weight=None, pi0=None):
    precision, recall, _ = precision_recall_curve_calib(
        y_true, y_pred, pos_label=pos_label, sample_weight=sample_weight, pi0=pi0)
    return -np.sum(np.diff(recall) * np.asarray(precision)[:-1])


def f1score_calib(y_true, y_pred, pi0=None):
    """Calibrated F1 from hard predictions (binary)."""
    y_true = np.asarray(y_true).astype(int)
    y_pred = np.asarray(y_pred).astype(int)
    tp = int(np.sum((y_true == 1) & (y_pred == 1)))
    fp = int(np.sum((y_true == 0) & (y_pred == 1)))
    fn = int(np.sum((y_true == 1) & (y_pred == 0)))
    tn = int(np.sum((y_true == 0) & (y_pred == 0)))
    pos = fn + tp

    recall = tp / float(pos)
    if pi0 is not None:
        pi = pos / float(tn + fn + tp + fp)
        ratio = pi * (1 - pi0) / (pi0 * (1 - pi))
        precision = tp / float(tp + ratio * fp)
    else:
        precision = tp / float(tp + fp)
    if np.isnan(precision):
        precision = 0
    if (precision + recall) == 0.0:
        return 0.0
    return (2 * precision * recall) / (precision + recall)


def bestf1score_calib(y_true, y_pred, pi0=None):
    precision, recall, _ = precision_recall_curve_calib(y_true, y_pred, pi0=pi0)
    with np.errstate(divide="ignore", invalid="ignore"):
        fscores = (2 * precision * recall) / (precision + recall)
    fscores = np.nan_to_num(fscores, nan=0, posinf=0, neginf=0)
    return np.max(fscores)


# ---------------------------------------------------------------------------
# Aggregate metric suite + bootstrap CIs
# ---------------------------------------------------------------------------

def avg_precision_at_recall_range(y_true, probas_pred, recall_range=(0.0, 1.0),
                                  sample_weight=None):
    precs, recs, _ = precision_recall_curve(
        y_true, probas_pred, sample_weight=sample_weight)
    precs = precs[::-1]
    recs = recs[::-1]

    idx_low = np.argwhere(recs <= recall_range[0])[-1][0]
    idx_high = np.argwhere(recs >= recall_range[1])[0][0]

    rec_interval = recs[idx_high] - recs[idx_low]
    return integrate.trapezoid(x=recs[idx_low:idx_high + 1],
                               y=precs[idx_low:idx_high + 1]) / rec_interval


def calc_bootstrap(metric, y_true, y_pred, n_bootstrap=100, seed=0,
                   stratified=True, alpha=95., ddof=0, verbose=False):
    """Stratified bootstrap of a binary metric → (value, stderr, ci_lo, ci_hi).

    Replays the reference's resampling order exactly
    (koafusion/various/_metrics_stat_anlys.py:28-80): global np.random seeding,
    per-class index resampling, skip draws with zero positives.
    """
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if len(np.unique(y_true)) > 2:
        raise ValueError(f"Expected binary target, got: {np.unique(y_true)}")

    np.random.seed(seed)
    metric_vals = []
    ind_pos = np.where(y_true == 1)[0]
    ind_neg = np.where(y_true == 0)[0]

    for _ in range(n_bootstrap):
        if stratified:
            ind_pos_bs = np.random.choice(ind_pos, ind_pos.shape[0])
            ind_neg_bs = np.random.choice(ind_neg, ind_neg.shape[0])
            ind = np.hstack((ind_pos_bs, ind_neg_bs))
        else:
            ind = np.random.choice(y_true.shape[0], y_true.shape[0])
        if y_true[ind].sum() == 0:
            continue
        metric_vals.append(metric(y_true[ind], y_pred[ind]))

    metric_val = metric(y_true, y_pred)
    ci_l = np.percentile(metric_vals, (100 - alpha) // 2)
    ci_h = np.percentile(metric_vals, alpha + (100 - alpha) // 2)
    std_err = np.std(metric_vals, ddof=ddof)
    return metric_val, std_err, ci_l, ci_h


_BINARY_TARGETS = ("prog_kl_12", "prog_kl_24", "prog_kl_36", "prog_kl_48",
                   "prog_kl_72", "prog_kl_96", "tiulpin2019_prog_bin")

_ROUNDED_KEYS = ("prevalence", "roc_auc", "avg_precision", "avg_ppv_calib",
                 "avg_npv", "cutoff", "youdens_index", "b_accuracy")


def calc_metrics_v2(prog_target, prog_pred_proba, target, with_curves=False,
                    bootstrap=False, kws_ppv=None, kws_bs=None):
    """Full metric dict for one prediction set — the evaluation contract.

    Keys/semantics mirror koafusion/various/_metrics_stat_anlys.py:83-216:
    sample_size, num_pos/neg, prevalence, roc_auc, avg_precision,
    avg_ppv_calib (pi0=0.12 default), avg_npv, Youden cutoff/index,
    b_accuracy, optional ROC/PR/PR-calib curves; all scalars rounded to 3.
    """
    out = dict()

    kws_bs_all = {"n_bootstrap": 1000, "seed": 0, "stratified": True, "alpha": 95}
    if kws_bs is not None:
        kws_bs_all.update(copy.deepcopy(kws_bs))
    kws_ppv_all = {"pi0": 0.12}
    if kws_ppv is not None:
        kws_ppv_all.update(copy.deepcopy(kws_ppv))

    prog_target = np.asarray(prog_target).squeeze()
    prog_pred_proba = np.asarray(prog_pred_proba)
    if prog_pred_proba.ndim == 3:
        prog_pred_proba = prog_pred_proba.squeeze(1)

    if len(np.unique(prog_target)) < 2:
        out.update({
            "sample_size": prog_target.shape[0],
            "num_pos": np.sum(prog_target == 1),
            "num_neg": np.sum(prog_target == 0),
        })
        for k in ("prevalence", "roc_auc", "avg_precision", "avg_ppv_calib",
                  "avg_npv", "cutoff", "youdens_index", "b_accuracy",
                  "roc_curve", "pr_curve"):
            out[k] = np.nan
        return out

    if target not in _BINARY_TARGETS:
        raise ValueError(f"Unknown target: {target}")

    y = prog_target
    p_pos = prog_pred_proba[:, 1]
    p_neg = prog_pred_proba[:, 0]

    out["sample_size"] = y.shape[0]
    out["num_pos"] = np.sum(y == 1)
    out["num_neg"] = np.sum(y == 0)
    out["prevalence"] = np.sum(y) / y.shape[0]

    if bootstrap:
        out["roc_auc"] = calc_bootstrap(roc_auc_score, y, p_pos, **kws_bs_all)
        out["avg_precision"] = calc_bootstrap(
            average_precision_score, y, p_pos, **kws_bs_all)
        fn_ppv = lambda t, p: average_precision_score_calib(
            t, p, pi0=kws_ppv_all["pi0"])
        out["avg_ppv_calib"] = calc_bootstrap(fn_ppv, y, p_pos, **kws_bs_all)
        fn_npv = lambda y1, y2: average_precision_score(y1, y2, pos_label=0)
        out["avg_npv"] = calc_bootstrap(fn_npv, y, p_neg, **kws_bs_all)
    else:
        out["roc_auc"] = roc_auc_score(y, p_pos)
        out["avg_precision"] = average_precision_score(y, p_pos)
        out["avg_ppv_calib"] = average_precision_score_calib(
            y, p_pos, pi0=kws_ppv_all["pi0"])
        out["avg_npv"] = average_precision_score(y, p_neg, pos_label=0)
        out["cutoff"] = sensitivity_specificity_cutoff(y, p_pos)
        out["youdens_index"] = youdens_index(y, p_pos, threshold=out["cutoff"])
        out["b_accuracy"] = balanced_accuracy_score(y, p_pos > 0.5)

        if with_curves:
            fpr, tpr, _ = roc_curve(y, p_pos)
            out["roc_curve"] = (fpr, tpr)
            prec, rec, _ = precision_recall_curve(y, p_pos)
            out["pr_curve"] = (prec, rec)
            prec, rec, _ = precision_recall_curve_calib(
                y_true=y, y_pred=p_pos, pi0=kws_ppv_all["pi0"])
            out["pr_calib_curve"] = (prec, rec)

    for k in out:
        if k in _ROUNDED_KEYS:
            out[k] = np.round(out[k], 3)
    return out


def mc_bacc(y_true, y_pred):
    return recall_score(y_true, y_pred, average="macro")


def sensitivity_specificity_cutoff(y_true, y_pred_proba):
    """Youden's-index-optimal decision threshold."""
    fpr, tpr, thresholds = roc_curve(y_true, y_pred_proba)
    idx = np.argmax(tpr - fpr)
    return thresholds[idx]


def youdens_index(y_true, y_pred_proba, threshold):
    y_pred = y_pred_proba >= threshold
    sensit = recall_score(y_true, y_pred, pos_label=1)
    specif = recall_score(y_true, y_pred, pos_label=0)
    return sensit + specif - 1.
