import textwrap

import pytest

from oaprogressionmmf_tpu.config import (
    Config, MissingMandatoryValue, load_config)


@pytest.fixture
def conf_tree(tmp_path):
    (tmp_path / "model").mkdir()
    (tmp_path / "root.yaml").write_text(textwrap.dedent("""
        path_project_root: ???
        experiment_id: exp1
        path_experiment_root: ${path_project_root}/results/${experiment_id}
        data:
          target: prog_kl_48
          sets:
            n0:
              name: oai
              modals: None
        training:
          batch_size: 8
          folds:
            num: 5
            idx: -1
    """))
    (tmp_path / "model" / "xr1_cnn.yaml").write_text(textwrap.dedent("""
        name: XR1Cnn
        input_size: None
        output_channels: 2
    """))
    return tmp_path


def test_basic_load_and_access(conf_tree):
    cfg = load_config(conf_tree / "root.yaml", ["path_project_root=/tmp/p"])
    assert cfg.data.target == "prog_kl_48"
    assert cfg["training"]["batch_size"] == 8
    assert cfg.path_experiment_root == "/tmp/p/results/exp1"


def test_missing_mandatory(conf_tree):
    cfg = load_config(conf_tree / "root.yaml")
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.path_project_root


def test_model_group_selection(conf_tree):
    cfg = load_config(conf_tree / "root.yaml",
                      ["model=xr1_cnn", "path_project_root=/x"])
    assert cfg.model.name == "XR1Cnn"
    assert cfg.model.output_channels == 2


def test_dotted_overrides_parse_yaml_values(conf_tree):
    cfg = load_config(conf_tree / "root.yaml", [
        "path_project_root=/x",
        "training.batch_size=64",
        "training.folds.idx=3",
        "data.sets.n0.modals=[xr_pa, clin]",
        "+model.input_size=[[700,700]]",
    ])
    assert cfg.training.batch_size == 64
    assert cfg.training.folds.idx == 3
    assert list(cfg.data.sets.n0.modals) == ["xr_pa", "clin"]
    assert list(cfg.model.input_size[0]) == [700, 700]


def test_unknown_override_rejected_without_plus(conf_tree):
    with pytest.raises(KeyError):
        load_config(conf_tree / "root.yaml", ["nonexistent.key=1"])


def test_to_yaml_roundtrip(conf_tree):
    cfg = load_config(conf_tree / "root.yaml", ["path_project_root=/x"])
    text = cfg.to_yaml(resolve=True)
    assert "prog_kl_48" in text
    assert "/x/results/exp1" in text


def test_interpolation_keeps_type():
    cfg = Config({"a": 5, "b": "${a}"})
    assert cfg.b == 5


def test_nested_item_assignment_mutates_tree():
    cfg = Config({"a": {"b": {"c": 1}}, "d": 2})
    cfg["a"]["b"]["c"] = 42
    assert cfg.a.b.c == 42
    cfg.a["b"]["c"] = 7
    assert cfg["a"]["b"]["c"] == 7
