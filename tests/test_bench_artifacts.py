"""Staleness checks for the committed bench.py offline artifacts.

bench.py ships two offline serving artifacts (regenerated with
OAPROG_BENCH_CALIB=force):

- ``bench_param_spec.json`` — the flagship's parameter spec (path →
  shape/dtype), standing in for the ~4-min eval_shape trace;
- ``bench_calib_scales.npz`` — calibrated activation amaxes for the
  default int8 serving mode, keyed by quant mode.

A model-architecture change that isn't followed by regeneration shows up
as a mismatch between these files (and between them and bench.py's
defaults). These tests make that mismatch a suite failure instead of a
runtime assert inside the driver's bench run (TODO #8).
"""

import json
import re
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _bench_source():
    return (REPO / "bench.py").read_text()


def _spec():
    with open(REPO / "bench_param_spec.json") as f:
        return json.load(f)


def test_calib_cache_key_matches_bench_default_quant():
    m = re.search(r'"OAPROG_BENCH_QUANT",\s*"([^"]+)"', _bench_source())
    assert m, "bench.py must read OAPROG_BENCH_QUANT with a literal default"
    default_quant = m.group(1)
    with np.load(REPO / "bench_calib_scales.npz") as z:
        assert "key" in z, "calib cache predates the keyed format"
        key = str(z["key"])
    assert key == f"amax__{default_quant}", (
        f"committed calib cache was generated for {key!r} but bench.py "
        f"defaults to quant={default_quant!r}; rerun "
        "OAPROG_BENCH_CALIB=force python bench.py")


def test_calib_cache_leaf_count_matches_param_spec():
    """The cached amax vector must line up with the spec's quant_acts
    leaves — bench.py zips them positionally (bench.py:237-242)."""
    qa = [e for e in _spec() if e["path"][0] == "quant_acts"]
    assert qa, "param spec was traced without the quant model"
    for e in qa:
        assert e["path"][-1].startswith("amax"), e["path"]
        assert tuple(e["shape"]) == (), e
        assert e["dtype"] == "float32", e
    with np.load(REPO / "bench_calib_scales.npz") as z:
        n_cached = len(z["amaxes"])
    assert n_cached == len(qa), (
        f"calib cache carries {n_cached} amaxes, param spec defines "
        f"{len(qa)} quant_acts leaves; rerun OAPROG_BENCH_CALIB=force")


def test_param_spec_covers_all_variable_collections():
    """Spot-check the spec still describes the flagship variable tree:
    params + batch_stats + quant_acts, both FE branches, the FeaT stack,
    and synthesizable leaf names (bench.py's synth_variables dispatches
    on the last path key)."""
    spec = _spec()
    collections = {e["path"][0] for e in spec}
    assert {"params", "batch_stats", "quant_acts"} <= collections
    joined = {"/".join(e["path"]) for e in spec}
    # one representative leaf per structural region
    assert any("fe_xr" in p or ("fe" in p and "conv1" in p) for p in joined)
    assert any(p.startswith("params/") and "transformer" in p
               for p in joined)
    # every params leaf must be synthesizable by name or rank
    for e in spec:
        if e["path"][0] != "params":
            continue
        name = e["path"][-1]
        ok = (name in ("scale", "var", "bias", "mean")
              or name.startswith("amax") or len(e["shape"]) >= 1)
        assert ok, f"unsynthesizable spec leaf {e['path']} {e['shape']}"
