"""Progression-label derivation tests (notebook cell-14 criterion parity)."""

import pandas as pd
import pytest

from oaprogressionmmf_tpu.data.targets import (crit_prog_kl_from_to,
                                               derive_progression_labels)


def _knee(visits, kls):
    return pd.DataFrame({"visit": visits, "XRKL": kls})


def test_progressor_within_horizon():
    d = _knee([0, 12, 24], [1, 2, 2])
    assert crit_prog_kl_from_to(d, 24) == (True, 1, "9: ok")


def test_stable_knee_is_negative():
    d = _knee([0, 12, 24], [2, 2, 2])
    assert crit_prog_kl_from_to(d, 24) == (True, 0, "9: ok")


def test_kl0_to_kl1_is_not_progression():
    d = _knee([0, 12], [0, 1])
    sel, label, reason = crit_prog_kl_from_to(d, 12)
    assert (sel, label) == (True, 0)  # KL0/KL1 merged


def test_kl4_at_baseline_excluded():
    d = _knee([0, 12], [4, 4])
    assert crit_prog_kl_from_to(d, 12) == (False, -1, "1: KLG4_at_baseline")


def test_tkr_at_baseline_excluded():
    d = _knee([0, 12], [5, 5])
    assert crit_prog_kl_from_to(d, 12) == (False, -1, "2: TKR_at_baseline")


def test_missing_baseline_excluded():
    d = _knee([12, 24], [2, 3])
    assert crit_prog_kl_from_to(d, 24) == (False, -1,
                                           "0: not_present_at_baseline")


def test_no_followups_excluded():
    d = _knee([0, 48], [2, 3])
    assert crit_prog_kl_from_to(d, 24) == (False, -1, "3: no_followups")


def test_kl_decrease_excluded():
    d = _knee([0, 12, 24], [3, 2, 3])
    assert crit_prog_kl_from_to(d, 24) == (False, -1, "4: KLG_decrease")


def test_absent_at_endpoint_without_progression_is_unknown():
    # present at 12m (stable), absent at 24m -> cannot rule out progression
    d = _knee([0, 12], [2, 2])
    assert crit_prog_kl_from_to(d, 24) == (False, -1,
                                           "5: insufficient_followups")


def test_progression_before_endpoint_counts_even_if_absent_at_end():
    d = _knee([0, 12], [2, 3])
    assert crit_prog_kl_from_to(d, 24) == (True, 1, "9: ok")


def test_missing_visit_records_ignored():
    d = _knee([0, 12, 24], [2, -1, 3])
    assert crit_prog_kl_from_to(d, 24) == (True, 1, "9: ok")


def test_derive_progression_labels_frame():
    df = pd.concat([
        _knee([0, 12, 24, 36, 48], [1, 1, 2, 2, 2]).assign(
            patient="p1", side="RIGHT"),
        _knee([0, 12, 24, 36, 48], [2, 2, 2, 2, 2]).assign(
            patient="p2", side="LEFT"),
    ])
    out = derive_progression_labels(df, visit_months=(12, 24, 48))
    assert len(out) == 2
    p1 = out[out.patient == "p1"].iloc[0]
    assert p1["prog_kl_12"] == 0 and p1["prog_kl_24"] == 1
    assert p1["panfilov_sel_kl_48"] == 1
    p2 = out[out.patient == "p2"].iloc[0]
    assert p2["prog_kl_48"] == 0
