from .seeding import set_ultimate_seed, PRNGChain
from .splits import StratifiedGroupKFold
from .metrics import (
    roc_auc_score, average_precision_score, balanced_accuracy_score,
    precision_recall_curve, roc_curve,
    precision_recall_curve_calib, average_precision_score_calib,
    f1score_calib, bestf1score_calib,
    avg_precision_at_recall_range, calc_bootstrap, calc_metrics_v2,
    sensitivity_specificity_cutoff, youdens_index,
)
from .formats import (
    nifti_to_numpy, numpy_to_nifti, png_to_numpy, numpy_to_png,
    png_series_to_numpy, png_series_to_nifti, nifti_to_png_series,
)
from .checkpoint import CheckpointHandler

__all__ = [
    "set_ultimate_seed", "PRNGChain", "StratifiedGroupKFold",
    "roc_auc_score", "average_precision_score", "balanced_accuracy_score",
    "precision_recall_curve", "roc_curve",
    "precision_recall_curve_calib", "average_precision_score_calib",
    "f1score_calib", "bestf1score_calib",
    "avg_precision_at_recall_range", "calc_bootstrap", "calc_metrics_v2",
    "sensitivity_specificity_cutoff", "youdens_index",
    "nifti_to_numpy", "numpy_to_nifti", "png_to_numpy", "numpy_to_png",
    "png_series_to_numpy", "png_series_to_nifti", "nifti_to_png_series",
    "CheckpointHandler",
]
