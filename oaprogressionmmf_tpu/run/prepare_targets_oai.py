"""CLI: derive progression targets + clinical meta —
`python -m oaprogressionmmf_tpu.run.prepare_targets_oai`.

Runnable form of the reference's targets notebook
(run/Targets_meta_and_scans_from_OAI.ipynb): takes the OAI longitudinal
KL-grade table and baseline clinical table (CSV exports of the OAI
releases), derives `prog_kl_*` / `panfilov_sel_kl_*` / `reason_kl_*`
labels per knee (data/targets.py), optionally joins the Tiulpin-2019
prior-art cohort labels, and writes `meta_base.csv` into
`OAI_Clin_prep/` — the file the index builder consumes.

Inputs:
  path_kl_long=...     CSV with columns patient, side, visit (months), XRKL
  path_clin_base=...   CSV with baseline clinical vars per (patient, side):
                       P02SEX, P02RACE, V00SITE, AGE, P01BMI, XRKL,
                       WOM*/P01INJ-/P01KSURG-/... (see data/index.py)
  dir_root_output=...  → <dir>/meta_base.csv
  [path_tiulpin=...]   optional prior-art labels CSV (ID, Side, Progressor)
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import yaml

from ..data.targets import derive_progression_labels

logger = logging.getLogger("prepare_targets")


def build_meta_base(path_kl_long, path_clin_base, path_tiulpin=None
                    ) -> pd.DataFrame:
    df_kl = pd.read_csv(path_kl_long, dtype={"patient": str, "side": str})
    df_clin = pd.read_csv(path_clin_base, dtype={"patient": str, "side": str})

    df_labels = derive_progression_labels(df_kl)
    df_labels["patient"] = df_labels["patient"].astype(str)

    out = df_clin.merge(
        df_labels.drop(columns=["visit"]), on=["patient", "side"],
        how="inner", validate="1:1")

    if path_tiulpin is not None:
        df_t = pd.read_csv(path_tiulpin)
        df_t["patient"] = df_t["ID"].astype(str)
        df_t["side"] = df_t["Side"].map({"R": "RIGHT", "L": "LEFT"})
        df_t = df_t.rename(columns={"Progressor": "tiulpin2019_prog",
                                    "Prog_increase": "tiulpin2019_kl_diff"})
        df_t["tiulpin2019_sel"] = 1
        out = out.merge(
            df_t[["patient", "side", "tiulpin2019_prog",
                  "tiulpin2019_kl_diff", "tiulpin2019_sel"]],
            on=["patient", "side"], how="left")
        out["tiulpin2019_prog"] = out["tiulpin2019_prog"].fillna(-1).astype(int)
        out["tiulpin2019_kl_diff"] = (
            out["tiulpin2019_kl_diff"].fillna(0).astype(int))
        out["tiulpin2019_sel"] = out["tiulpin2019_sel"].fillna(0).astype(int)
    else:
        out["tiulpin2019_prog"] = -1
        out["tiulpin2019_kl_diff"] = 0
        out["tiulpin2019_sel"] = 0

    if "visit_month" not in out.columns:
        out["visit_month"] = "000m"
    return out


def build_scan_extract(dir_root_oai_mri, sequence: str,
                       visit_month: str = "00m",
                       patients=None) -> "pd.DataFrame":
    """Scan an OAI raw DICOM tree for series of one sequence → extract table.

    The notebook's scan-extraction step (Targets_meta_and_scans_from_OAI):
    produces the `meta_extract__<sequence>.csv` with a `Folder` column
    (release/patient/date/barcode) that prepare_data_mri_oai consumes.
    Series are identified by sniffing the first slice's SeriesDescription
    with the in-repo DICOM reader.
    """
    from ..utils.dicom import dcmread

    root = Path(dir_root_oai_mri) / visit_month
    rows = []
    # layout: <root>/<visit>/<release>/<patient>/<date>/<barcode>/(slices)
    for series_dir in sorted(root.glob("*/*/*/*")):
        if not series_dir.is_dir():
            continue
        rel = series_dir.relative_to(root)
        release, patient = rel.parts[0], rel.parts[1]
        if patients is not None and patient not in set(map(str, patients)):
            continue
        for fn in sorted(series_dir.iterdir()):
            try:
                ds = dcmread(fn, stop_before_pixels=True)
            except Exception:  # noqa: BLE001 - non-DICOM content
                continue
            series = str(ds.get("SeriesDescription", "")).upper()
            if sequence in series:
                rows.append({"Folder": str(rel), "ParticipantID": patient,
                             "SeriesDescription": series,
                             "release": release})
            break
    return pd.DataFrame(rows)


def copy_scans_from_oai(dir_scan_source, dir_scan_target,
                        df_extract: pd.DataFrame, num_threads: int = 4,
                        dry_run: bool = False) -> pd.DataFrame:
    """Copy the selected DICOM series out of an OAI image release.

    The targets notebook's scan-copying step
    (Targets_meta_and_scans_from_OAI.ipynb, "copy_scans_from_oai" cell):
    for each extract row, copy `<source>/<visit_month[1:]>/<Folder>` into
    the same layout under `dir_scan_target`, skip-and-log missing series
    (SURVEY §5.3 prep resilience), and return only the successfully copied
    rows — the caller persists them as the raw tree's `meta_base.csv`.
    IO-bound → thread pool (the reference uses joblib n_jobs=4).
    """
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    src_root = Path(dir_scan_source)
    dst_root = Path(dir_scan_target)
    dst_root.mkdir(parents=True, exist_ok=True)

    def one(row) -> bool:
        vm = str(row.get("visit_month", "000m"))[1:]
        p_from = src_root / vm / str(row["Folder"])
        p_to = dst_root / vm / str(row["Folder"])
        if not p_from.exists():
            logger.warning(f"Missing: {p_from}")
            return False
        if not dry_run and not p_to.exists():
            shutil.copytree(p_from, p_to)
        return True

    with ThreadPoolExecutor(max_workers=max(1, int(num_threads))) as pool:
        ok = list(pool.map(one, (r for _, r in df_extract.iterrows())))
    out = df_extract.loc[list(ok), :]
    logger.info(f"Copied {int(np.sum(ok)) if ok else 0}/{len(df_extract)} "
                f"series into {dst_root}")
    return out


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    config = {"path_kl_long": None, "path_clin_base": None,
              "dir_root_output": None, "path_tiulpin": None,
              "dir_scan_source": None, "dir_scan_target": None,
              "path_csv_extract": None, "num_threads": 4,
              "scan_dry_run": False}
    for ov in argv:
        k, v = ov.split("=", 1)
        config[k] = yaml.safe_load(v)

    did_something = False
    if config["path_kl_long"] or config["path_clin_base"]:
        for k in ("path_kl_long", "path_clin_base", "dir_root_output"):
            if not config[k]:
                raise SystemExit(f"Missing required override: {k}=...")
        out = build_meta_base(config["path_kl_long"],
                              config["path_clin_base"],
                              config["path_tiulpin"])
        out_dir = Path(config["dir_root_output"])
        out_dir.mkdir(parents=True, exist_ok=True)
        out.to_csv(out_dir / "meta_base.csv", index=False)
        logger.info(f"Wrote {len(out)} knees to {out_dir / 'meta_base.csv'}")
        did_something = True

    # scan-copy stage (notebook cell "copy_scans_from_oai"): needs an
    # extract table + source/target roots
    if config["dir_scan_source"] or config["dir_scan_target"]:
        for k in ("dir_scan_source", "dir_scan_target", "path_csv_extract"):
            if not config[k]:
                raise SystemExit(f"Missing required override: {k}=...")
        df_extract = pd.read_csv(config["path_csv_extract"],
                                 dtype={"ParticipantID": str})
        df_copied = copy_scans_from_oai(
            config["dir_scan_source"], config["dir_scan_target"], df_extract,
            num_threads=int(config["num_threads"]),
            dry_run=bool(config["scan_dry_run"]))
        df_copied.to_csv(Path(config["dir_scan_target"]) / "meta_base.csv",
                         index=False)
        did_something = True

    if not did_something:
        raise SystemExit(
            "Nothing to do: pass path_kl_long/path_clin_base/"
            "dir_root_output for targets, and/or dir_scan_source/"
            "dir_scan_target/path_csv_extract for scan copying")




if __name__ == "__main__":
    main()
