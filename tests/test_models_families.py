"""Shape-contract tests for the six model families on tiny configs.

Mirrors the reference's constructor/forward contract
(`Model(config)` + forward → {"main": (B, 2)} dict, SURVEY.md §2.1 M4-M7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oaprogressionmmf_tpu.models import MODEL_ARITY, dict_models

AGG = {"num_slices": None, "depth": 1, "heads": 2, "emb_dropout": 0.1,
       "mlp_dim": 64, "mlp_dropout": 0.1}

FE1 = {"arch": "resnet18", "pretrained": False, "with_gap": True,
       "dropout": 0.0, "dims_view": "rc"}


def _cfg(name, **over):
    cfg = {
        "name": name,
        "input_size": None,
        "downscale": False,
        "input_channels": 1,
        "output_channels": 2,
        "output_type": "dict",
        "debug": False,
        "restore_weights": False,
        "agg": dict(AGG),
        "fe": dict(FE1),
    }
    cfg.update(over)
    return cfg


def _init_and_run(model, xs):
    variables = model.init(jax.random.key(0), *xs, train=False)
    out = model.apply(variables, *xs, train=False)
    return variables, out


def test_xr1_cnn_shapes():
    cfg = _cfg("XR1Cnn", input_size=[[64, 64]],
               agg={"hidden_size": 32, "dropout": 0.5})
    model = dict_models["XR1Cnn"](config=cfg)
    x = jnp.ones((2, 1, 64, 64))
    _, out = _init_and_run(model, (x,))
    assert out["main"].shape == (2, 2)


def test_mr1_cnn_trf_shapes():
    cfg = _cfg("MR1CnnTrf", input_size=[[64, 64, 4]])
    cfg["agg"]["num_slices"] = 4
    model = dict_models["MR1CnnTrf"](config=cfg)
    x = jnp.ones((2, 1, 64, 64, 4))
    _, out = _init_and_run(model, (x,))
    assert out["main"].shape == (2, 2)


@pytest.mark.parametrize("dims_view,vol_shape", [
    ("rc", (1, 1, 64, 64, 4)),
    ("cs", (1, 1, 64, 64, 4)),
    ("rs", (1, 1, 64, 64, 4)),
])
def test_mr1_dims_view(dims_view, vol_shape):
    fe = dict(FE1, dims_view=dims_view)
    cfg = _cfg("MR1CnnTrf", input_size=[[64, 64, 4]], fe=fe)
    cfg["agg"]["num_slices"] = 4
    model = dict_models["MR1CnnTrf"](config=cfg)
    x = jnp.ones(vol_shape)
    _, out = _init_and_run(model, (x,))
    assert out["main"].shape == (1, 2)


def test_mr2_cnn_trf_shapes():
    cfg = _cfg("MR2CnnTrf", input_size=[[64, 64, 4], [64, 64, 2]])
    cfg["agg"]["num_slices"] = [4, 2]
    model = dict_models["MR2CnnTrf"](config=cfg)
    x0 = jnp.ones((2, 1, 64, 64, 4))
    x1 = jnp.ones((2, 1, 64, 64, 2))
    variables, out = _init_and_run(model, (x0, x1))
    assert out["main"].shape == (2, 2)
    # two independent FEs (deepcopy semantics, _mrN_cnn_trf.py:150-163)
    assert "fe0" in variables["params"] and "fe1" in variables["params"]


@pytest.mark.parametrize("dims_view", ["cs", "rs"])
def test_mr2_dims_view(dims_view):
    """dims_view threading on the 2-MRI path (extension of the reference's
    MR1-only dims_view, _mrN_cnn_trf.py:60-71)."""
    fe = dict(FE1, dims_view=dims_view, with_gap=False)
    cfg = _cfg("MR2CnnTrf", input_size=[[64, 64, 32], [64, 64, 32]], fe=fe)
    cfg["agg"]["num_slices"] = [32, 32]
    model = dict_models["MR2CnnTrf"](config=cfg)
    x0 = jnp.ones((1, 1, 64, 64, 32))
    x1 = jnp.ones((1, 1, 64, 64, 32))
    _, out = _init_and_run(model, (x0, x1))
    assert out["main"].shape == (1, 2)


def test_mr2_oracle_sizes_and_collapse():
    """The arch-aware spatial oracle computes exact FE-map shapes for any
    input (48² → 2² for resnets: 24,12,6,3,2 — the reference's static
    table raised here, _mrN_cnn_trf.py:196-200, because it was incomplete,
    not because the shape is unsupported), and still fails loudly when an
    arch collapses the map to zero size instead of mis-sizing the
    pos-embedding."""
    fe = dict(FE1, with_gap=False)
    cfg = _cfg("MR2CnnTrf", input_size=[[48, 48, 2], [48, 48, 2]], fe=fe)
    cfg["agg"]["num_slices"] = [2, 2]
    model = dict_models["MR2CnnTrf"](config=cfg)
    x = jnp.ones((1, 1, 48, 48, 2))
    variables = model.init(jax.random.key(0), x, x, train=False)
    out = model.apply(variables, x, x, train=False)
    assert out["main"].shape == (1, 2)
    # 2 slices x 2x2 maps x 2 sequences (+CLS) tokens behind the FeaT
    pe = variables["params"]["agg"]["pos_embedding"]
    assert pe.shape[1] == 2 * 2 * 2 * 2 + 1

    fe_bad = dict(FE1, arch="vgg16", with_gap=False)
    cfg_bad = _cfg("MR2CnnTrf", input_size=[[25, 25, 2], [25, 25, 2]],
                   fe=fe_bad)
    cfg_bad["agg"]["num_slices"] = [2, 2]
    model_bad = dict_models["MR2CnnTrf"](config=cfg_bad)
    with pytest.raises(ValueError, match="collapses"):
        model_bad.init(jax.random.key(0), jnp.ones((1, 1, 25, 25, 2)),
                       jnp.ones((1, 1, 25, 25, 2)), train=False)


FE_FUSION = {
    "xr": {"arch": "resnet18", "pretrained": False, "with_gap": True,
           "dropout": 0.0},
    "mr": {"arch": "resnet18", "pretrained": False, "with_gap": True,
           "dropout": 0.0},
}


def test_xr1mr1_shapes():
    cfg = _cfg("XR1MR1CnnTrf", input_size=[[64, 64], [64, 64, 4]],
               fe=dict(FE_FUSION))
    cfg["agg"]["num_slices"] = [1, 4]
    model = dict_models["XR1MR1CnnTrf"](config=cfg)
    x0 = jnp.ones((2, 1, 64, 64))
    x1 = jnp.ones((2, 1, 64, 64, 4))
    _, out = _init_and_run(model, (x0, x1))
    assert out["main"].shape == (2, 2)


def test_xr1mr2_hierarchical_shapes():
    cfg = _cfg("XR1MR2CnnTrf",
               input_size=[[64, 64], [64, 64, 4], [64, 64, 2]],
               fe=dict(FE_FUSION))
    cfg["agg"]["num_slices"] = [1, 4, 2]
    model = dict_models["XR1MR2CnnTrf"](config=cfg)
    xs = (jnp.ones((2, 1, 64, 64)), jnp.ones((2, 1, 64, 64, 4)),
          jnp.ones((2, 1, 64, 64, 2)))
    variables, out = _init_and_run(model, xs)
    assert out["main"].shape == (2, 2)
    # hierarchical fusion: two CLS-less per-MR FeaTs + one final CLS FeaT
    for sub in ("agg_1", "agg_2", "agg_final"):
        assert sub in variables["params"], sub
    assert "cls_token" not in variables["params"]["agg_1"]
    assert "cls_token" in variables["params"]["agg_final"]


def test_xr1mr2c1_flagship_shapes():
    fe = dict(FE_FUSION)
    fe["clin"] = {"dim_in": 9, "dim_out": 512, "dropout": 0.1}
    cfg = _cfg("XR1MR2C1CnnTrf",
               input_size=[[64, 64], [64, 64, 4], [64, 64, 2], [16]],
               fe=fe)
    cfg["agg"]["num_slices"] = [1, 4, 2, 1]
    model = dict_models["XR1MR2C1CnnTrf"](config=cfg)
    xs = (jnp.ones((2, 1, 64, 64)), jnp.ones((2, 1, 64, 64, 4)),
          jnp.ones((2, 1, 64, 64, 2)), jnp.ones((2, 1, 9)))
    variables, out = _init_and_run(model, xs)
    assert out["main"].shape == (2, 2)
    assert "fe_clin" in variables["params"]


def test_output_type_main_returns_raw_logits():
    cfg = _cfg("XR1Cnn", input_size=[[64, 64]], output_type="main",
               agg={"hidden_size": 32, "dropout": 0.5})
    model = dict_models["XR1Cnn"](config=cfg)
    x = jnp.ones((1, 1, 64, 64))
    _, out = _init_and_run(model, (x,))
    assert out.shape == (1, 2)


def test_registry_covers_reference_surface():
    assert set(dict_models) == {"XR1Cnn", "MR1CnnTrf", "MR2CnnTrf",
                                "XR1MR1CnnTrf", "XR1MR2CnnTrf",
                                "XR1MR2C1CnnTrf"}
    assert MODEL_ARITY["XR1MR2C1CnnTrf"] == 4


def test_train_mode_is_stochastic_and_updates_bn():
    cfg = _cfg("MR1CnnTrf", input_size=[[64, 64, 2]])
    cfg["agg"]["num_slices"] = 2
    model = dict_models["MR1CnnTrf"](config=cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 64, 64, 2),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out1, mut = model.apply(variables, x, train=True,
                            rngs={"dropout": jax.random.key(1)},
                            mutable=["batch_stats"])
    out2, _ = model.apply(variables, x, train=True,
                          rngs={"dropout": jax.random.key(2)},
                          mutable=["batch_stats"])
    assert np.abs(np.asarray(out1["main"] - out2["main"])).max() > 0
    assert mut["batch_stats"]  # BN stats were mutated
