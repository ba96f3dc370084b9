"""Reference-checkpoint interop: flax ↔ torch-named state dict round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oaprogressionmmf_tpu.models import FeaT, dict_models
from oaprogressionmmf_tpu.utils.torch_interop import (
    export_reference_checkpoint, flax_feat_to_torch, flax_fe_to_torch_seq,
    import_reference_checkpoint, torch_feat_to_flax, torch_seq_fe_to_flax)


def _trees_equal(a, b, path=""):
    assert type(a) is type(b) or isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   err_msg=path)


def test_feat_roundtrip():
    model = FeaT(num_patches=6, patch_dim=16, emb_dim=32, depth=2, heads=2,
                 mlp_dim=24, num_classes=2)
    variables = model.init(jax.random.key(0), jnp.ones((1, 6, 16)))
    p = jax.device_get(variables["params"])
    sd = flax_feat_to_torch(p, "_agg")
    assert "_agg.transformer.attn_0.to_qkv.weight" in sd
    assert "_agg.mlp_head0.4.weight" in sd
    back = torch_feat_to_flax(sd, "_agg", depth=2)
    _trees_equal(p, back)


def test_fe_roundtrip():
    from oaprogressionmmf_tpu.models.resnet import ResNetFE, Bottleneck
    fm = ResNetFE(stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck)
    variables = fm.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)))
    p = jax.device_get(variables["params"])
    s = jax.device_get(variables["batch_stats"])
    sd = flax_fe_to_torch_seq(p, s, "_fe")
    assert "_fe.0.weight" in sd          # conv1 → Sequential idx 0
    assert "_fe.4.0.conv1.weight" in sd  # layer1 block 0
    p2, s2 = torch_seq_fe_to_flax(sd, "_fe")
    _trees_equal(p, p2)
    _trees_equal(s, s2)


def test_full_model_roundtrip_forward_parity():
    """Export → import must reproduce the exact forward outputs."""
    cfg = {
        "name": "MR1CnnTrf", "input_size": [[64, 64, 2]], "downscale": False,
        "input_channels": 1, "output_channels": 2, "output_type": "main",
        "debug": False, "restore_weights": False,
        "fe": {"arch": "resnet18", "pretrained": False, "with_gap": True,
               "dropout": 0.0, "dims_view": "rc"},
        "agg": {"num_slices": 2, "depth": 1, "heads": 2, "emb_dropout": 0.1,
                "mlp_dim": 32, "mlp_dropout": 0.1},
    }
    model = dict_models["MR1CnnTrf"](config=cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 64, 64, 2),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out0 = model.apply(variables, x, train=False)

    sd = export_reference_checkpoint("MR1CnnTrf",
                                     jax.device_get(variables))
    variables2 = import_reference_checkpoint("MR1CnnTrf", sd, depth=1)
    out1 = model.apply(variables2, x, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_xr1cnn_layout():
    cfg = {
        "name": "XR1Cnn", "input_size": [[64, 64]], "downscale": False,
        "input_channels": 1, "output_channels": 2, "output_type": "main",
        "debug": False, "restore_weights": False,
        "fe": {"arch": "resnet18", "pretrained": False, "with_gap": True,
               "dropout": 0.0},
        "agg": {"hidden_size": 32, "dropout": 0.5},
    }
    model = dict_models["XR1Cnn"](config=cfg)
    variables = model.init(jax.random.key(0), jnp.ones((1, 1, 64, 64)),
                           train=False)
    sd = export_reference_checkpoint("XR1Cnn", jax.device_get(variables))
    # reference naming: _fe Sequential + _agg.1 Linear + _final Linear
    assert "_fe.0.weight" in sd
    assert "_agg.1.weight" in sd and "_final.weight" in sd
    variables2 = import_reference_checkpoint("XR1Cnn", sd)
    out0 = model.apply(variables, jnp.ones((1, 1, 64, 64)), train=False)
    out1 = model.apply(variables2, jnp.ones((1, 1, 64, 64)), train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)
