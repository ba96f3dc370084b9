"""CLI: clinical-variable baselines (LogReg + DecisionTree) —
`python -m oaprogressionmmf_tpu.run.train_prog_clin`.

Surface parity with koafusion/run/train_prog_clin.py:63-267: shares the
imaging provider's splits (same exclusions, same site-D test, same CV
folds — the critical property for fair model comparison), standardizes
age/BMI/WOMAC, one-hot encodes sex/KL/inj/surg, grid-searches or reuses
stored best params, trains one estimator per fold via cross-validation,
ensembles test predictions by mean probability, and pickles them in the
same schema the eval app emits.

Host-side sklearn on ~thousand-row tabular data — no TPU involvement is
warranted here (SURVEY.md §7.7).
"""

from __future__ import annotations

import logging
import pickle
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np
from sklearn import linear_model, model_selection, preprocessing, tree

from ..config import load_config
from ..data.provider import sources_from_path
from ..utils.seeding import set_ultimate_seed

logger = logging.getLogger("train_prog_clin")

CONF_DIR = Path(__file__).parent / "conf"

VAR_TO_COL = {
    "age": "AGE", "sex": "P02SEX", "bmi": "P01BMI", "kl": "XRKL",
    "inj": "P01INJ-", "surg": "P01KSURG-", "womac": "WOMTS-",
}

PARAM_GRIDS = {
    "LR": {"class_weight": [None, "balanced"]},
    "DT": {
        "max_depth": [3, 10, 30],
        "min_samples_split": [10, 30, 100, 300],
        "min_samples_leaf": [10, 30, 100],
        "max_features": [None, "sqrt", "log2"],
        "class_weight": [None, "balanced"],
    },
}

PREV_BEST = {
    "LR": {"class_weight": "balanced"},
    "DT": {"class_weight": "balanced", "max_depth": 10,
           "max_features": "log2", "min_samples_leaf": 100,
           "min_samples_split": 100},
}

CLFS = {"LR": linear_model.LogisticRegression,
        "DT": tree.DecisionTreeClassifier}


def _feature_matrix(df, sel_vars, encoders):
    """Assemble [age, sex-1hot, bmi, (kl/inj/surg 1-hots), (womac)]."""
    blocks = []
    for v in ("age", "sex", "bmi"):
        blocks.append(_enc(encoders[v], df[VAR_TO_COL[v]]))
    for v in ("kl", "inj", "surg"):
        if v in sel_vars:
            blocks.append(_enc(encoders[v], df[VAR_TO_COL[v]]))
    if "womac" in sel_vars:
        blocks.append(_enc(encoders["womac"], df[VAR_TO_COL["womac"]]))
    return np.concatenate(blocks, axis=1)


def _enc(enc, series):
    arr = series.to_numpy().reshape(-1, 1)
    out = enc.transform(arr)
    return out.toarray() if hasattr(out, "toarray") else out


class ClinicalBaseline:
    def __init__(self, config):
        self.config = config
        sources = sources_from_path(
            path_data_root=config.path_data_root,
            modals_all=config.data.modals_all,
            target=config.data.target,
            fold_num=config.training.folds.num,
            scheme_train_val=config.scheme_train_val,
            seed_trainval_test=config.seed_trainval_test,
            seed_train_val=config.seed_train_val,
            site_test=config.site_test,
            ignore_cache=config.data.ignore_cache,
        )
        d = config.data.sets.n0
        src = sources[d.name]
        self.df_trainval = src["trainval_df"]["-"]
        self.df_test = src["test_df"]["-"]
        self.folds = list(src["trainval_folds"])

        root = Path(config.path_experiment_root)
        root.mkdir(exist_ok=True, parents=True)
        self.path_weights = root / "weights"
        self.path_weights.mkdir(exist_ok=True, parents=True)
        sel_knee = ("incid" if "sag_t2_map" in config.data.modals_all
                    else "all")
        self.path_logs = root / "logs_eval" / sel_knee
        self.path_logs.mkdir(exist_ok=True, parents=True)

    def fit(self) -> dict:
        cfg = self.config
        sel_vars = list(cfg.model.vars)

        encoders = {
            "age": preprocessing.StandardScaler(),
            "sex": preprocessing.OneHotEncoder(),
            "bmi": preprocessing.StandardScaler(),
            "kl": preprocessing.OneHotEncoder(),
            "inj": preprocessing.OneHotEncoder(),
            "surg": preprocessing.OneHotEncoder(),
            "womac": preprocessing.StandardScaler(),
        }
        for v, enc in encoders.items():
            enc.fit(self.df_trainval[VAR_TO_COL[v]].to_numpy().reshape(-1, 1))

        X_trainval = _feature_matrix(self.df_trainval, sel_vars, encoders)
        y_trainval = self.df_trainval[cfg.data.target].to_numpy()
        X_test = _feature_matrix(self.df_test, sel_vars, encoders)
        y_test = self.df_test[cfg.data.target].to_numpy()

        # hyper-parameters
        if cfg.model.params_init == "grid_search":
            params = {}
            for name, cls in CLFS.items():
                gs = model_selection.GridSearchCV(
                    estimator=cls(), param_grid=PARAM_GRIDS[name],
                    scoring=cfg.validation.criterion,
                    n_jobs=int(cfg.get("num_workers", 12)),
                    cv=iter(self.folds), refit=False,
                    return_train_score=True)
                gs.fit(X_trainval, y_trainval)
                params[name] = gs.best_params_
                logger.info(f"{name} best params: {gs.best_params_}")
        elif cfg.model.params_init == "prev_best":
            params = {k: dict(v) for k, v in PREV_BEST.items()}
        else:
            raise ValueError(f"Unknown `params_init`: {cfg.model.params_init}")

        # per-fold estimators + mean-probability test ensemble
        models = {}
        raw_ens = defaultdict(dict)
        for name, cls in CLFS.items():
            cv_results = model_selection.cross_validate(
                estimator=cls(random_state=0, **params[name]),
                X=X_trainval, y=y_trainval,
                scoring=cfg.validation.criterion,
                cv=iter(self.folds),
                n_jobs=int(cfg.get("num_workers", 12)),
                return_estimator=True)
            models[name] = cv_results["estimator"]
            logger.info(f"{name} OOF {cfg.validation.criterion}: "
                        f"{cv_results['test_score']}")

            vars_cols = [VAR_TO_COL[v] for v in ("age", "sex", "bmi")]
            raw_ens[name] = self.df_test.loc[
                :, vars_cols + ["exam_knee_id"]].to_dict(orient="list")

            proba_foldw = np.asarray([m.predict_proba(X_test)
                                      for m in models[name]])
            proba_mean = np.mean(proba_foldw, axis=0)
            for fold_idx in range(int(cfg.training.folds.num)):
                raw_ens[name][f"predict_proba__{fold_idx}"] = \
                    proba_foldw[fold_idx]
                raw_ens[name][f"predict__{fold_idx}"] = \
                    np.argmax(proba_foldw[fold_idx], axis=1)
            raw_ens[name]["predict_proba"] = proba_mean
            raw_ens[name]["predict"] = np.argmax(proba_mean, axis=1)
            raw_ens[name]["target"] = y_test

        path_raw = self.path_logs / "eval_clin_raw_ens.pkl"
        path_raw.write_bytes(pickle.dumps(dict(raw_ens),
                                          pickle.HIGHEST_PROTOCOL))
        logger.info(f"Saved test predictions to {path_raw}")

        for name in CLFS:
            path_model = self.path_weights / f"{name}_all-folds.pkl"
            path_model.write_bytes(pickle.dumps(models[name]))
            logger.info(f"Saved model {name} to {path_model}")
        return {"raw_ens": dict(raw_ens), "models": models, "params": params}


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = load_config(CONF_DIR / "prog_clin.yaml", argv)

    logging.basicConfig(level=logging.INFO)
    Path(config.path_logs).mkdir(exist_ok=True, parents=True)
    fh = logging.FileHandler(Path(config.path_logs, "train_prog_clin.log"))
    fh.setLevel(logging.DEBUG)
    logging.getLogger().addHandler(fh)

    set_ultimate_seed()
    logger.info(config.to_yaml(resolve=True))
    ClinicalBaseline(config).fit()


if __name__ == "__main__":
    main()
