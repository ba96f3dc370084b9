"""SAS7BDAT ingestion: writer round-trip + raw-release consumers.

The reference reads raw OAI `.sas7bdat` releases directly
(prior_art/tiulpin2019multimodal__create_labels.py:9-33 and the targets
notebook); these tests prove the rebuild does too — fixtures are written
by the in-repo writer (utils/sas.py) and parsed back through the
independent pandas SAS parser, so conformance is cross-checked.
"""

import numpy as np
import pandas as pd
import pytest

from oaprogressionmmf_tpu.utils.sas import read_sas_table, write_sas7bdat


def test_sas_roundtrip_types_and_missing(tmp_path):
    df = pd.DataFrame({
        "ID": [9000001.0, 9000002.0, 9000003.0],
        "SIDE": [1.0, 2.0, 1.0],
        "V00XRKL": [0.0, 3.0, np.nan],
        "VERSION": ["V00", "V01", "V99"],
        "NOTE": ["hello", "", "a longer string"],
    })
    p = write_sas7bdat(df, tmp_path / "t.sas7bdat")
    out = read_sas_table(p)
    assert list(out.columns) == list(df.columns)
    np.testing.assert_allclose(out["ID"], df["ID"])
    assert np.isnan(out["V00XRKL"].iloc[2])
    assert out["VERSION"].tolist() == ["V00", "V01", "V99"]
    assert out["NOTE"].iloc[2] == "a longer string"
    # SAS blank character == missing
    assert pd.isna(out["NOTE"].iloc[1])


def test_sas_roundtrip_multipage(tmp_path):
    """More rows than fit one page exercises the page chain."""
    n = 2000
    rng = np.random.RandomState(0)
    df = pd.DataFrame({"X": rng.randn(n),
                       "LABEL": [f"row{i:04d}" for i in range(n)]})
    p = write_sas7bdat(df, tmp_path / "big.sas7bdat")
    out = read_sas_table(p)
    assert len(out) == n
    np.testing.assert_allclose(out["X"], df["X"])
    assert out["LABEL"].iloc[-1] == f"row{n - 1:04d}"


def _write_kxr_tables(dirpath, codes, as_sas=True):
    """Tiny coherent KL-trajectory tables: 3 patients x both sides."""
    # per (ID, SIDE): KL at visits in code order
    traj = {
        (1, 1): [1, 1, 2, 2, 3, 3],    # progressor at 2nd follow-up
        (1, 2): [0, 0, 0, 0, 0, 0],    # non-progressor, present at last
        (2, 1): [2, 2, 2, 2, 2, 2],    # non-progressor
        (2, 2): [3, 3, 3, 9, 9, 9],    # TKR (coded out-of-range)
        (3, 1): [4, 4, 4, 4, 4, 4],    # KL4 at baseline -> excluded
        (3, 2): [1, 2, 2, 2, 2, 2],    # early progressor
    }
    for ci, code in enumerate(codes):
        rows = []
        for (pid, side), kls in traj.items():
            kl = kls[min(ci, len(kls) - 1)]  # repeat last for extra visits
            rows.append({"ID": float(9000000 + pid), "SIDE": float(side),
                         f"V{code}XRKL": float(kl)})
        t = pd.DataFrame(rows)
        if as_sas:
            write_sas7bdat(t, dirpath / f"kxr_sq_bu{code}.sas7bdat")
        else:
            t.to_csv(dirpath / f"kxr_sq_bu{code}.csv", index=False)
    return traj


def test_prior_art_from_raw_sas_matches_csv(tmp_path):
    """build_img_progression_meta gives identical cohorts whether the OAI
    tables are raw .sas7bdat releases or CSV conversions."""
    from oaprogressionmmf_tpu.prior_art.tiulpin2019 import (
        EXAM_CODES, build_img_progression_meta)

    d_sas = tmp_path / "sas"
    d_csv = tmp_path / "csv"
    d_sas.mkdir()
    d_csv.mkdir()
    _write_kxr_tables(d_sas, EXAM_CODES, as_sas=True)
    _write_kxr_tables(d_csv, EXAM_CODES, as_sas=False)

    out_sas = build_img_progression_meta(d_sas)
    out_csv = build_img_progression_meta(d_csv)
    key = ["ID", "Side"]
    pd.testing.assert_frame_equal(
        out_sas.sort_values(key).reset_index(drop=True),
        out_csv.sort_values(key).reset_index(drop=True),
        check_dtype=False)
    assert len(out_sas) > 0
    # the KL4-at-baseline knee is excluded
    assert not ((out_sas.ID == 9000003) & (out_sas.Side == "R")).any()


def test_prepare_targets_from_raw_sas(tmp_path):
    """build_meta_base_from_sas consumes the raw releases end-to-end and
    matches the CSV-ingestion path on labels and clinical columns."""
    from oaprogressionmmf_tpu.run.prepare_targets_oai import (
        SAS_EXAM_MONTHS, build_meta_base, build_meta_base_from_sas)

    d = tmp_path / "sas"
    d.mkdir()
    codes = list(SAS_EXAM_MONTHS)
    traj = _write_kxr_tables(d, codes, as_sas=True)

    # allclinical00 + enrollees releases
    ids = sorted({pid for pid, _ in traj})
    clin = pd.DataFrame({
        "ID": [float(9000000 + pid) for pid in ids],
        "V00AGE": [61.0, 55.0, 70.0],
        "P01BMI": [27.5, 31.0, 24.2],
        "V00WOMTSL": [5.0, 12.0, 3.0],
        "V00WOMTSR": [4.0, 10.0, 2.0],
        "V00WOMADLL": [3.0, 8.0, 1.0],
        "V00WOMADLR": [2.0, 7.0, 1.0],
        "V00WOMKPL": [1.0, 3.0, 0.0],
        "V00WOMKPR": [1.0, 2.0, 0.0],
        "V00WOMSTFL": [1.0, 1.0, 2.0],
        "V00WOMSTFR": [1.0, 1.0, 1.0],
        "P01INJL": [0.0, 1.0, 0.0],
        "P01INJR": [0.0, 0.0, 0.0],
        "P01KSURGL": [0.0, 0.0, 0.0],
        "P01KSURGR": [0.0, 1.0, 0.0],
    })
    write_sas7bdat(clin, d / "allclinical00.sas7bdat")
    enr = pd.DataFrame({
        "ID": [float(9000000 + pid) for pid in ids],
        "P02SEX": [1.0, 2.0, 1.0],
        "P02RACE": [1.0, 1.0, 2.0],
        "V00SITE": ["A", "B", "D"],
    })
    write_sas7bdat(enr, d / "enrollees.sas7bdat")

    out = build_meta_base_from_sas(d)
    assert len(out) == 6  # 3 patients x 2 sides
    assert {"prog_kl_36", "panfilov_sel_kl_36", "reason_kl_36",
            "AGE", "P01BMI", "WOMTS-", "P01INJ-", "P01KSURG-",
            "XRKL", "V00SITE"} <= set(out.columns)

    # equivalent CSV-path inputs -> identical labels
    kl_rows = []
    for (pid, side), kls in traj.items():
        for ci, code in enumerate(codes):
            kl = int(kls[min(ci, len(kls) - 1)])
            kl_rows.append({"patient": str(9000000 + pid),
                            "side": {1: "RIGHT", 2: "LEFT"}[side],
                            "visit": SAS_EXAM_MONTHS[code],
                            "XRKL": kl if 0 <= kl <= 4 else 5})
    pd.DataFrame(kl_rows).to_csv(tmp_path / "kl_long.csv", index=False)
    clin_csv = out[["patient", "side", "AGE", "P01BMI", "WOMTS-",
                    "P01INJ-", "P01KSURG-", "XRKL", "P02SEX", "P02RACE",
                    "V00SITE", "visit_month"]].copy()
    clin_csv.to_csv(tmp_path / "clin.csv", index=False)
    out_csv = build_meta_base(tmp_path / "kl_long.csv", tmp_path / "clin.csv")

    key = ["patient", "side"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out_csv.sort_values(key).reset_index(drop=True)
    for col in [c for c in a.columns
                if c.startswith(("prog_kl_", "panfilov_sel_", "reason_kl_"))]:
        assert col in b.columns, col
        assert a[col].tolist() == b[col].tolist(), col

    # the progressor knee got labelled, the TKR knee rejected
    row = a[(a.patient == "9000001") & (a.side == "RIGHT")].iloc[0]
    assert row["prog_kl_96"] == 1
    row = a[(a.patient == "9000002") & (a.side == "LEFT")].iloc[0]
    assert row["panfilov_sel_kl_96"] == 0


def test_write_sas7bdat_rejects_empty():
    with pytest.raises(ValueError, match="no columns"):
        write_sas7bdat(pd.DataFrame(), "/tmp/x.sas7bdat")
