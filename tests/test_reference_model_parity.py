"""Full-model behavioral parity against the reference model classes.

Loads the reference's own model code (vendored torchvision ResNet, FeaT,
and the fusion family classes) from the read-only checkout as oracles,
injects our flax-trained weights through utils/torch_interop, and checks
that forward outputs are numerically identical. This validates, end to end:
encoder semantics (incl. grouped ResNeXt), per-slice folding, hierarchical
FeaT fusion, the clinical branch, and the checkpoint-interop naming.
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/koafusion")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not available")


def _ref_module(dotted: str):
    full = f"refkoa.{dotted}"
    if full in sys.modules:
        return sys.modules[full]
    if "refkoa" not in sys.modules:
        pkg = types.ModuleType("refkoa")
        pkg.__path__ = [str(REF)]
        sys.modules["refkoa"] = pkg
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        sub = "refkoa." + ".".join(parts[:i])
        if sub not in sys.modules:
            mod = types.ModuleType(sub)
            mod.__path__ = [str(REF.joinpath(*parts[:i]))]
            sys.modules[sub] = mod
    spec = importlib.util.spec_from_file_location(
        full, REF.joinpath(*parts[:-1], parts[-1] + ".py"),
        submodule_search_locations=[])
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refkoa." + ".".join(parts[:-1])
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    """Reference model modules with torchvision faked by the vendored copy."""
    vendored = _ref_module("models._torchvision")

    class _TVModels:
        def __getattr__(self, name):
            return getattr(vendored, name, None)

    fake_tv = types.ModuleType("torchvision")
    fake_tv.models = _TVModels()
    sys.modules.setdefault("torchvision", fake_tv)
    sys.modules["torchvision"].models = _TVModels()

    return {
        "vendored": vendored,
        "mrN": _ref_module("models._mrN_cnn_trf"),
        "xr1": _ref_module("models._xr1_cnn"),
        "xrNmrMcP": _ref_module("models._xrNmrMcP"),
    }


def _randomize_bn_stats(stats, seed=0):
    rng = np.random.RandomState(seed)

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "mean":
                node[k] = rng.uniform(-0.5, 0.5, np.shape(v)).astype(
                    np.float32)
            elif k == "var":
                node[k] = rng.uniform(0.5, 1.5, np.shape(v)).astype(
                    np.float32)
    walk(stats)
    return stats


@pytest.mark.parametrize("arch", ["resnet18", "resnet50", "resnext50_32x4d"])
def test_encoder_matches_vendored_torchvision(ref_models, arch):
    """Our flax encoder with weights exported to the reference's vendored
    ResNet produces identical pooled features."""
    import jax
    import jax.numpy as jnp
    import torch

    from oaprogressionmmf_tpu.models.resnet import FE_ARCHS
    from oaprogressionmmf_tpu.utils.torch_interop import (
        flax_fe_to_torch_seq, torch_seq_fe_to_flax)

    tm_full = getattr(ref_models["vendored"], arch)(pretrained=False)
    tm = torch.nn.Sequential(*list(tm_full.children())[:-1]).eval()

    fm = FE_ARCHS[arch](with_gap=True, remat=False)
    variables = fm.init(jax.random.key(0), jnp.ones((1, 64, 64, 3)))
    params = jax.device_get(variables["params"])
    stats = _randomize_bn_stats(jax.device_get(variables["batch_stats"]))

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_fe_to_torch_seq(params, stats, "fe").items()}
    sd = {k[3:]: v for k, v in sd.items()}  # strip "fe." prefix
    tm.load_state_dict(sd)

    x = np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).flatten(1).numpy()
    with jax.default_matmul_precision("highest"):
        got = fm.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def _compare_family(ref_cls, our_name, cfg, xs_np, ref_models, atol=5e-4):
    import jax
    import jax.numpy as jnp
    import torch

    from oaprogressionmmf_tpu.config import Config
    from oaprogressionmmf_tpu.models import dict_models
    from oaprogressionmmf_tpu.utils.torch_interop import (
        export_reference_checkpoint)

    model = dict_models[our_name](config=cfg)
    xs = tuple(jnp.asarray(x) for x in xs_np)
    with jax.default_matmul_precision("highest"):
        variables = model.init(jax.random.key(0), *xs, train=False)
        variables = {
            "params": jax.device_get(variables["params"]),
            "batch_stats": _randomize_bn_stats(
                jax.device_get(variables.get("batch_stats", {}))),
        }
        got = model.apply(variables, *xs, train=False)["main"]

    sd = {k: torch.from_numpy(np.asarray(v, np.float32).copy())
          for k, v in export_reference_checkpoint(our_name,
                                                  variables).items()}
    tm = ref_cls(config=Config(dict(cfg)), path_weights=None).eval()
    tm.load_state_dict(sd)
    with torch.no_grad():
        want = tm(*[torch.from_numpy(x) for x in xs_np])["main"].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=atol)


def test_mr1_cnn_trf_full_model_parity(ref_models):
    cfg = {
        "name": "MR1CnnTrf", "input_size": [[64, 64, 3]], "downscale": False,
        "input_channels": 1, "output_channels": 2, "output_type": "dict",
        "debug": False, "restore_weights": False,
        "fe": {"arch": "resnet18", "pretrained": False, "with_gap": True,
               "dropout": 0.0, "dims_view": "rc"},
        "agg": {"num_slices": 3, "depth": 2, "heads": 2, "emb_dropout": 0.0,
                "mlp_dim": 32, "mlp_dropout": 0.0},
    }
    xs = (np.random.RandomState(0).rand(2, 1, 64, 64, 3).astype(np.float32),)
    _compare_family(ref_models["mrN"].MR1CnnTrf, "MR1CnnTrf", cfg, xs,
                    ref_models)


def test_xr1_cnn_full_model_parity(ref_models):
    cfg = {
        "name": "XR1Cnn", "input_size": [[64, 64]], "downscale": False,
        "input_channels": 1, "output_channels": 2, "output_type": "dict",
        "debug": False, "restore_weights": False,
        "fe": {"arch": "resnet18", "pretrained": False, "with_gap": True,
               "dropout": 0.0},
        "agg": {"hidden_size": 32, "dropout": 0.0},
    }
    xs = (np.random.RandomState(1).rand(2, 1, 64, 64).astype(np.float32),)
    _compare_family(ref_models["xr1"].XR1Cnn, "XR1Cnn", cfg, xs, ref_models)


def test_flagship_full_model_parity(ref_models):
    """XR1MR2C1CnnTrf: 4-branch hierarchical fusion, reference vs ours."""
    cfg = {
        "name": "XR1MR2C1CnnTrf",
        "input_size": [[64, 64], [64, 64, 3], [64, 64, 2], [16]],
        "downscale": False, "input_channels": 1, "output_channels": 2,
        "output_type": "dict", "debug": False, "restore_weights": False,
        "fe": {
            "xr": {"arch": "resnet18", "pretrained": False, "with_gap": True,
                   "dropout": 0.0},
            "mr": {"arch": "resnet18", "pretrained": False, "with_gap": True,
                   "dropout": 0.0},
            "clin": {"dim_in": 9, "dim_out": 512, "dropout": 0.0},
        },
        "agg": {"num_slices": [1, 3, 2, 1], "depth": 1, "heads": 2,
                "emb_dropout": 0.0, "mlp_dim": 32, "mlp_dropout": 0.0},
    }
    rng = np.random.RandomState(2)
    xs = (rng.rand(2, 1, 64, 64).astype(np.float32),
          rng.rand(2, 1, 64, 64, 3).astype(np.float32),
          rng.rand(2, 1, 64, 64, 2).astype(np.float32),
          rng.rand(2, 1, 9).astype(np.float32))
    _compare_family(ref_models["xrNmrMcP"].XR1MR2C1CnnTrf, "XR1MR2C1CnnTrf",
                    cfg, xs, ref_models)
