"""Shipped config tree: every model group loads and matches its family."""

from pathlib import Path

import pytest

from oaprogressionmmf_tpu.config import load_config
from oaprogressionmmf_tpu.models import MODEL_ARITY, dict_models

CONF = Path(__file__).parent.parent / "oaprogressionmmf_tpu" / "run" / "conf"
MODEL_FILES = sorted(p.stem for p in (CONF / "model").glob("*.yaml"))


def test_all_six_model_groups_ship():
    assert MODEL_FILES == ["mr1_cnn_trf", "mr2_cnn_trf", "xr1_cnn",
                           "xr1mr1_cnn_trf", "xr1mr2_cnn_trf",
                           "xr1mr2c1_cnn_trf"]


@pytest.mark.parametrize("name", MODEL_FILES)
def test_model_group_loads_and_is_registered(name):
    cfg = load_config(CONF / "prog_fus.yaml",
                      [f"model={name}", "path_project_root=/tmp/x",
                       "path_data_root=/tmp/x"])
    assert cfg.model.name in dict_models
    assert cfg.model.name in MODEL_ARITY
    assert int(cfg.model.output_channels) == 2
    if "agg" in cfg.model and "depth" in cfg.model.agg:
        assert int(cfg.model.agg.depth) >= 1


def test_prog_clin_conf_loads():
    cfg = load_config(CONF / "prog_clin.yaml",
                      ["path_project_root=/tmp/x", "path_data_root=/tmp/x"])
    assert list(cfg.model.vars) == ["age", "sex", "bmi"]
    assert cfg.model.params_init == "prev_best"


def test_flagship_conf_consistency():
    cfg = load_config(CONF / "prog_fus.yaml",
                      ["model=xr1mr2c1_cnn_trf", "path_project_root=/t",
                       "path_data_root=/t"])
    assert len(cfg.model.input_size) == 4
    assert len(cfg.model.downscale) == 4
    assert len(cfg.model.agg.num_slices) == 4
    assert cfg.model.fe.clin.dim_in == 9
