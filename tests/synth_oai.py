"""Synthetic OAI-shaped data tree for integration tests.

Builds a miniature version of the prepared-data layout the reference's prep
apps emit (OAI_*_prep dirs with meta CSVs + per-exam image files), with tiny
image shapes so CPU tests stay fast.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from oaprogressionmmf_tpu.utils.formats import numpy_to_nifti, numpy_to_png

XR_SHAPE = (80, 80)            # (R, C), crop target 64x64
MRI_SHAPE = (72, 72, 6)        # (R, C, S), crop target 64x64x4

SEQ_OF_MODAL = {
    "xr_pa": ("OAI_XR_PA_prep", "XR_PA"),
    "sag_3d_dess": ("OAI_SAG_3D_DESS_prep", "SAG_3D_DESS"),
    "cor_iw_tse": ("OAI_COR_IW_TSE_prep", "COR_IW_TSE"),
    "sag_t2_map": ("OAI_SAG_T2_MAP_prep", "SAG_T2_MAP"),
}

CLIN_DEFAULTS = {
    "P02RACE": "1: White", "XRKL": 2,
    "XROSFL": 0, "XROSFM": 0, "XROSTL": 0, "XROSTM": 0,
    "XRJSL": 0.0, "XRJSM": 0.0,
    "XRSCFL": 0, "XRSCFM": 0, "XRSCTL": 0, "XRSCTM": 0,
    "XRATTL": 0, "XRATTM": 0,
    "WOMADL-": 1.0, "WOMKP-": 1.0, "WOMSTF-": 1.0,
    "KP-30CV": 0, "KRS-12": 0, "P01KRS-": 0,
    "P01ART-": 0, "P01ART-INJ": 0, "P01MEN-": 0, "P01MEN-INJ": 0,
    "P01LR-": 0, "P01OTSURG-": 0, "P01OTS-INJ": 0,
    "tiulpin2019_kl_diff": 0,
}


def build_synth_tree(root: Path, n_patients: int = 12,
                     modals=("xr_pa", "sag_3d_dess", "cor_iw_tse",
                             "sag_t2_map"),
                     seed: int = 0) -> pd.DataFrame:
    """Write a synthetic prepared-OAI tree under `root`; returns clin meta."""
    rng = np.random.RandomState(seed)
    root = Path(root)

    rows = []
    for p in range(n_patients):
        patient = f"9{p:06d}"
        site = ["A", "B", "C", "D", "E"][p % 5]
        for side in ("RIGHT", "LEFT"):
            target = int(rng.rand() < 0.4)
            rows.append({
                "patient": patient, "visit_month": "000m", "side": side,
                "P02SEX": "MALE" if p % 2 == 0 else "FEMALE",
                "V00SITE": site,
                "AGE": int(rng.randint(45, 80)),
                "P01BMI": float(rng.uniform(20, 36)),
                "WOMTS-": float(rng.uniform(0, 40)),
                "P01INJ-": int(rng.rand() < 0.2),
                "P01KSURG-": int(rng.rand() < 0.1),
                "tiulpin2019_prog": target,
                "tiulpin2019_sel": 1,
                **{f"prog_kl_{m}": target for m in (12, 24, 36, 48, 72, 96)},
                **{f"panfilov_sel_kl_{m}": 1 for m in (12, 24, 36, 48, 72, 96)},
                **{f"reason_kl_{m}": "00_ok" for m in (12, 24, 36, 48, 72, 96)},
                **CLIN_DEFAULTS,
            })
    df_clin = pd.DataFrame(rows)

    clin_dir = root / "OAI_Clin_prep"
    clin_dir.mkdir(parents=True, exist_ok=True)
    df_clin.to_csv(clin_dir / "meta_base.csv", index=False)

    for modal in modals:
        subdir, seq = SEQ_OF_MODAL[modal]
        mdir = root / subdir
        mdir.mkdir(parents=True, exist_ok=True)
        meta_rows = []
        for _, r in df_clin.iterrows():
            exam_dir = (mdir / r["patient"] / r["visit_month"] /
                        f"KNEE__{r['side']}__{seq}")
            exam_dir.mkdir(parents=True, exist_ok=True)
            if modal == "xr_pa":
                img = (rng.rand(*XR_SHAPE) * 255).astype(np.uint8)
                numpy_to_png(img, exam_dir / "image.png")
                meta_rows.append({
                    "patient": r["patient"], "visit_month": r["visit_month"],
                    "side": r["side"], "body_part": "KNEE", "sequence": seq,
                    "pixel_spacing_0": 0.14, "pixel_spacing_1": 0.14,
                })
            else:
                vol = (rng.rand(*MRI_SHAPE) * 250).astype(np.float32)
                if seq == "COR_IW_TSE":
                    numpy_to_nifti(vol, exam_dir / "image.nii.gz",
                                   spacings=(0.36, 0.36, 3.0),
                                   irp_to_ras=True)
                else:
                    numpy_to_nifti(vol, exam_dir / "image.nii.gz",
                                   spacings=(0.36, 0.36, 0.7),
                                   ipr_to_ras=True)
                meta_rows.append({
                    "patient": r["patient"], "visit_month": r["visit_month"],
                    "side": r["side"], "body_part": "KNEE", "sequence": seq,
                    "pixel_spacing_0": 0.36, "pixel_spacing_1": 0.36,
                    "slice_thickness": 0.7,
                })
        pd.DataFrame(meta_rows).to_csv(mdir / "meta_images.csv", index=False)

    return df_clin


def make_synth_config(tmp_path: Path, model_name: str = "XR1Cnn",
                      modals=("xr_pa",), **overrides):
    """Config object pointing at a synthetic tree, tiny shapes, CPU-sized."""
    from oaprogressionmmf_tpu.config import config_from_dict

    input_sizes = []
    for m in modals:
        if m == "clin":
            input_sizes.append([16])
        elif m == "xr_pa":
            input_sizes.append([64, 64])
        else:
            input_sizes.append([64, 64, 4])

    fe1 = {"arch": "resnet18", "pretrained": False, "with_gap": True,
           "dropout": 0.0, "dims_view": "rc"}
    fe_fusion = {
        "xr": dict(fe1), "mr": dict(fe1),
        "clin": {"dim_in": 9, "dim_out": 512, "dropout": 0.1},
    }
    n_mri = sum(1 for m in modals if m.startswith(("sag", "cor")))
    num_slices = []
    for m in modals:
        num_slices.append(4 if m.startswith(("sag", "cor")) else 1)

    tree = {
        "path_project_root": str(tmp_path),
        "path_data_root": str(tmp_path / "data"),
        "experiment_id": "synth",
        "path_experiment_root": str(tmp_path / "results"),
        "path_logs": str(tmp_path / "results" / "logs"),
        "data": {
            "modals_all": list(modals) + (["clin"] if "clin" not in modals
                                          else []),
            "sets": {"n0": {"name": "oai", "modals": list(modals),
                            "frac_classw": 1.0}},
            "target": "prog_kl_48",
            "exclude_surg": False, "exclude_inj": False,
            "ignore_cache": False, "debug": False,
        },
        "training": {
            "loss": {"name": "FocalLoss",
                     "params": {"reduction": "mean", "gamma": 2.0}},
            "optim": {"name": "Adam", "lr_init": 1e-3, "weight_decay": 1e-4},
            "sched": {"name": "CustomWarmupStaticDecayLR",
                      "params": {"epochs_warmup": 5, "epochs_static": 100,
                                 "epochs_decay": 1}},
            "sampler": "weighted",
            "batch_size": 4,
            "epochs": {"num": 1},
            "folds": {"num": 3, "idx": 0, "ignore": None},
            "debug": False,
        },
        "validation": {"criterion": "avg_precision", "batch_size": 4,
                       "debug": False},
        "testing": {"batch_size": 4, "folds": {"idx": -1, "ignore": None},
                    "use_cached": False, "describe_data": False,
                    "regime": "eval", "metrics_foldw": True,
                    "ensemble_foldw": True, "metrics_ensemble": True,
                    "explain_fn": "modal_abl", "debug": False,
                    "profile": "none"},
        "runtime": {"compute_dtype": "float32", "n_devices": None},
        "num_workers": 2,
        "seed_trainval_test": 0,
        "seed_train_val": 0,
        "scheme_train_val": "strat_target",
        "site_test": "D",
        "model": {
            "name": model_name,
            "input_size": input_sizes,
            "downscale": False,
            "input_channels": 1,
            "output_channels": 2,
            "output_type": "dict",
            "pretrained": False,
            "restore_weights": False,
            "debug": False,
            "fe": fe_fusion if model_name.startswith("XR1MR") else dict(fe1),
            "agg": ({"hidden_size": 32, "dropout": 0.5}
                    if model_name == "XR1Cnn" else
                    {"num_slices": (num_slices if len(modals) > 1
                                    else num_slices[0]),
                     "depth": 1, "heads": 2, "emb_dropout": 0.1,
                     "mlp_dim": 64, "mlp_dropout": 0.1}),
        },
    }
    tree.update(overrides)
    return config_from_dict(tree)
