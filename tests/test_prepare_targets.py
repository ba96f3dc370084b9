"""prepare_targets_oai app: meta_base.csv derivation end-to-end."""

import numpy as np
import pandas as pd

from oaprogressionmmf_tpu.run.prepare_targets_oai import build_meta_base, main


def _write_inputs(tmp_path):
    kl_rows = []
    for patient, side, traj in [
        ("9000001", "RIGHT", {0: 1, 12: 2, 24: 2, 36: 2, 48: 2, 72: 2, 96: 2}),
        ("9000002", "LEFT", {0: 2, 12: 2, 24: 2, 36: 2, 48: 2, 72: 2, 96: 2}),
        ("9000003", "RIGHT", {0: 4, 12: 4}),
    ]:
        for visit, kl in traj.items():
            kl_rows.append({"patient": patient, "side": side,
                            "visit": visit, "XRKL": kl})
    pd.DataFrame(kl_rows).to_csv(tmp_path / "kl_long.csv", index=False)

    clin_rows = [
        {"patient": p, "side": s, "P02SEX": "MALE", "V00SITE": "A",
         "AGE": 60, "P01BMI": 27.0, "XRKL": 1, "WOMTS-": 3.0,
         "P01INJ-": 0, "P01KSURG-": 0}
        for p, s in [("9000001", "RIGHT"), ("9000002", "LEFT"),
                     ("9000003", "RIGHT")]
    ]
    pd.DataFrame(clin_rows).to_csv(tmp_path / "clin.csv", index=False)

    pd.DataFrame({"ID": [9000001], "Side": ["R"], "Progressor": [1],
                  "Prog_increase": [1]}).to_csv(
        tmp_path / "tiulpin.csv", index=False)


def test_build_meta_base(tmp_path):
    _write_inputs(tmp_path)
    out = build_meta_base(tmp_path / "kl_long.csv", tmp_path / "clin.csv",
                          tmp_path / "tiulpin.csv")
    out = out.set_index("patient")
    assert out.loc["9000001", "prog_kl_12"] == 1
    assert out.loc["9000001", "panfilov_sel_kl_48"] == 1
    assert out.loc["9000002", "prog_kl_48"] == 0
    # KL4 baseline knee rejected for all horizons
    assert out.loc["9000003", "panfilov_sel_kl_12"] == 0
    assert out.loc["9000003", "reason_kl_12"] == "1: KLG4_at_baseline"
    # prior-art join
    assert out.loc["9000001", "tiulpin2019_prog"] == 1
    assert out.loc["9000002", "tiulpin2019_sel"] == 0


def test_main_writes_meta_base(tmp_path):
    _write_inputs(tmp_path)
    out_dir = tmp_path / "OAI_Clin_prep"
    main([f"path_kl_long={tmp_path / 'kl_long.csv'}",
          f"path_clin_base={tmp_path / 'clin.csv'}",
          f"dir_root_output={out_dir}"])
    df = pd.read_csv(out_dir / "meta_base.csv")
    assert len(df) == 3
    assert "visit_month" in df.columns
    assert set(df["visit_month"]) == {"000m"}


def test_build_scan_extract(tmp_path):
    from oaprogressionmmf_tpu.run.prepare_targets_oai import build_scan_extract
    from oaprogressionmmf_tpu.utils import dicom as D

    def write_series(release, patient, barcode, series):
        d = tmp_path / "00m" / release / patient / "20050101" / barcode
        d.mkdir(parents=True)
        import numpy as np
        D.dcmwrite(d / "001.dcm", {
            "PatientID": patient, "SeriesDescription": series,
            "Rows": 4, "Columns": 4, "BitsAllocated": 16,
            "PixelRepresentation": 0, "PixelSpacing": [0.36, 0.36],
            "SliceThickness": 0.7,
            "PixelData": np.zeros((4, 4), np.uint16).tobytes()})

    write_series("0.C.2", "9000001", "111", "SAG_3D_DESS_RIGHT")
    write_series("0.C.2", "9000001", "222", "COR_IW_TSE_RIGHT")
    write_series("0.E.1", "9000002", "333", "SAG_3D_DESS_LEFT")

    df = build_scan_extract(tmp_path, "SAG_3D_DESS")
    assert len(df) == 2
    assert set(df["ParticipantID"]) == {"9000001", "9000002"}
    assert all("SAG_3D_DESS" in s for s in df["SeriesDescription"])
    assert df["Folder"].iloc[0].count("/") == 3

    df2 = build_scan_extract(tmp_path, "SAG_3D_DESS", patients=["9000002"])
    assert len(df2) == 1


def test_copy_scans_from_oai(tmp_path):
    """Notebook scan-copy parity: copy selected series trees, skip missing,
    return only copied rows (Targets_meta_and_scans_from_OAI.ipynb)."""
    import pandas as pd
    from oaprogressionmmf_tpu.run.prepare_targets_oai import (
        copy_scans_from_oai)

    src = tmp_path / "OAIBaselineImages"
    series = src / "00m" / "0.E.1" / "9000001" / "20050101" / "12345"
    series.mkdir(parents=True)
    (series / "001").write_bytes(b"fake-dicom")

    df = pd.DataFrame([
        {"Folder": "0.E.1/9000001/20050101/12345", "visit_month": "000m",
         "ParticipantID": "9000001"},
        {"Folder": "0.E.1/9000002/20050101/99999", "visit_month": "000m",
         "ParticipantID": "9000002"},   # missing on disk
    ])
    dst = tmp_path / "OAI_SAG_3D_DESS_raw"
    out = copy_scans_from_oai(src, dst, df, num_threads=2)

    assert len(out) == 1
    assert out.iloc[0]["ParticipantID"] == "9000001"
    copied = dst / "00m" / "0.E.1" / "9000001" / "20050101" / "12345" / "001"
    assert copied.read_bytes() == b"fake-dicom"


def test_copy_scans_dry_run(tmp_path):
    import pandas as pd
    from oaprogressionmmf_tpu.run.prepare_targets_oai import (
        copy_scans_from_oai)

    src = tmp_path / "src"
    (src / "00m" / "rel" / "p" / "d" / "b").mkdir(parents=True)
    df = pd.DataFrame([{"Folder": "rel/p/d/b", "visit_month": "000m"}])
    dst = tmp_path / "dst"
    out = copy_scans_from_oai(src, dst, df, dry_run=True)
    assert len(out) == 1
    assert not (dst / "00m" / "rel").exists()
