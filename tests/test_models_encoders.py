"""Non-ResNet encoders: torch-checkpoint import parity + shape contracts.

Oracles are hand-built torch modules with torchvision-compatible parameter
naming and forward semantics (torchvision itself is not installed), same
pattern as test_models_resnet.py. Completes FE-registry coverage to the
reference's full list (koafusion/models/_core_fes.py:6-15).
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from oaprogressionmmf_tpu.models.encoders import (
    DenseNetFE, InceptionV3FE, SqueezeNetFE, VGGFE,
    convert_torch_densenet_state, convert_torch_inception_state,
    convert_torch_squeezenet_state, convert_torch_vgg_state)
from oaprogressionmmf_tpu.models.resnet import FE_ARCHS, FE_OUT_CHANNELS


def _randomize_bn_stats(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# SqueezeNet 1.0
# ---------------------------------------------------------------------------

class _TFire(tnn.Module):
    def __init__(self, cin, squeeze, e1, e3):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = tnn.Conv2d(squeeze, e1, 1)
        self.expand3x3 = tnn.Conv2d(squeeze, e3, 3, padding=1)

    def forward(self, x):
        x = TF.relu(self.squeeze(x))
        return torch.cat([TF.relu(self.expand1x1(x)),
                          TF.relu(self.expand3x3(x))], dim=1)


class _TorchSqueezeNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 96, 7, stride=2),
            tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, stride=2, ceil_mode=True),
            _TFire(96, 16, 64, 64),
            _TFire(128, 16, 64, 64),
            _TFire(128, 32, 128, 128),
            tnn.MaxPool2d(3, stride=2, ceil_mode=True),
            _TFire(256, 32, 128, 128),
            _TFire(256, 48, 192, 192),
            _TFire(384, 48, 192, 192),
            _TFire(384, 64, 256, 256),
            tnn.MaxPool2d(3, stride=2, ceil_mode=True),
            _TFire(512, 64, 256, 256),
        )

    def forward(self, x):
        return self.features(x)


def test_squeezenet_weight_import_parity():
    torch.manual_seed(0)
    tm = _TorchSqueezeNet().eval()
    x = np.random.RandomState(0).rand(2, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # (B, 512, h, w)

    params, stats = convert_torch_squeezenet_state(tm.state_dict())
    assert stats == {}
    fm = SqueezeNetFE(with_gap=False)
    with jax.default_matmul_precision("highest"):
        out = fm.apply({"params": params},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(want, (0, 2, 3, 1)), atol=5e-4)


def test_squeezenet_ceil_pool_spatial_contract():
    # 224 → torchvision squeezenet1_0 gives 13x13 maps (ceil-mode pools)
    fm = SqueezeNetFE(with_gap=False)
    variables = fm.init(jax.random.key(0), jnp.ones((1, 224, 224, 1)))
    out = fm.apply(variables, jnp.ones((1, 224, 224, 1)), train=False)
    assert out.shape == (1, 13, 13, 512)


# ---------------------------------------------------------------------------
# VGG16
# ---------------------------------------------------------------------------

class _TorchVGG16(tnn.Module):
    def __init__(self):
        super().__init__()
        plan = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M")
        layers, cin = [], 3
        for item in plan:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, item, 3, padding=1),
                           tnn.ReLU(inplace=True)]
                cin = item
        self.features = tnn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


def test_vgg16_weight_import_parity():
    torch.manual_seed(1)
    tm = _TorchVGG16().eval()
    x = np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # (B, 512, 2, 2)
    assert want.shape == (2, 512, 2, 2)

    params, stats = convert_torch_vgg_state(tm.state_dict())
    assert stats == {}
    fm = VGGFE(with_gap=False)
    with jax.default_matmul_precision("highest"):
        out = fm.apply({"params": params},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(want, (0, 2, 3, 1)), atol=5e-4)


# ---------------------------------------------------------------------------
# DenseNet (small variant; the converter infers the block config)
# ---------------------------------------------------------------------------

class _TDenseLayer(tnn.Module):
    def __init__(self, cin, growth, bn_size):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                bias=False)

    def forward(self, x):
        y = self.conv1(TF.relu(self.norm1(x)))
        y = self.conv2(TF.relu(self.norm2(y)))
        return torch.cat([x, y], dim=1)


class _TTransition(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm = tnn.BatchNorm2d(cin)
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return TF.avg_pool2d(self.conv(TF.relu(self.norm(x))), 2, 2)


class _TorchDenseNet(tnn.Module):
    def __init__(self, growth=8, block_config=(2, 3), init_features=16,
                 bn_size=4):
        super().__init__()
        features = OrderedDict()
        features["conv0"] = tnn.Conv2d(3, init_features, 7, 2, 3, bias=False)
        features["norm0"] = tnn.BatchNorm2d(init_features)
        c = init_features
        for bi, n in enumerate(block_config, start=1):
            block = tnn.Module()
            for li in range(1, n + 1):
                block.add_module(f"denselayer{li}",
                                 _TDenseLayer(c, growth, bn_size))
                c += growth
            self_block_name = f"denseblock{bi}"
            features[self_block_name] = block
            if bi != len(block_config):
                features[f"transition{bi}"] = _TTransition(c, c // 2)
                c //= 2
        features["norm5"] = tnn.BatchNorm2d(c)
        self.features = tnn.Module()
        for k, v in features.items():
            self.features.add_module(k, v)
        self._block_config = block_config

    def forward(self, x):
        f = self.features
        x = TF.max_pool2d(TF.relu(f.norm0(f.conv0(x))), 3, 2, 1)
        for bi in range(1, len(self._block_config) + 1):
            block = getattr(f, f"denseblock{bi}")
            for li in range(1, self._block_config[bi - 1] + 1):
                x = getattr(block, f"denselayer{li}")(x)
            if bi != len(self._block_config):
                x = getattr(f, f"transition{bi}")(x)
        return f.norm5(x)


def test_densenet_weight_import_parity():
    torch.manual_seed(2)
    tm = _TorchDenseNet().eval()
    _randomize_bn_stats(tm)
    x = np.random.RandomState(2).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
        want_maps = want.numpy()
        want_gap = TF.relu(want).mean(dim=(2, 3)).numpy()

    params, stats = convert_torch_densenet_state(tm.state_dict())
    fm = DenseNetFE(growth_rate=8, block_config=(2, 3),
                    num_init_features=16, with_gap=False)
    with jax.default_matmul_precision("highest"):
        maps = fm.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        train=False)
        gap = DenseNetFE(growth_rate=8, block_config=(2, 3),
                         num_init_features=16, with_gap=True).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.asarray(maps),
                               np.transpose(want_maps, (0, 2, 3, 1)),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(gap), want_gap, atol=5e-4)


# ---------------------------------------------------------------------------
# Inception v3
# ---------------------------------------------------------------------------

class _TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return TF.relu(self.bn(self.conv(x)))


class _TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = _TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = _TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(TF.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class _TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            TF.max_pool2d(x, 3, stride=2)], 1)


class _TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = _TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7_3 = _TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch_pool = _TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(TF.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = _TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _TBasicConv2d(192, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7x3_3 = _TBasicConv2d(192, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7x3_4 = _TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            TF.max_pool2d(x, 3, stride=2)], 1)


class _TInceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = _TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = _TBasicConv2d(384, 384, kernel_size=(1, 3),
                                          padding=(0, 1))
        self.branch3x3_2b = _TBasicConv2d(384, 384, kernel_size=(3, 1),
                                          padding=(1, 0))
        self.branch3x3dbl_1 = _TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(448, 384, kernel_size=3,
                                            padding=1)
        self.branch3x3dbl_3a = _TBasicConv2d(384, 384, kernel_size=(1, 3),
                                             padding=(0, 1))
        self.branch3x3dbl_3b = _TBasicConv2d(384, 384, kernel_size=(3, 1),
                                             padding=(1, 0))
        self.branch_pool = _TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        bp = self.branch_pool(TF.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class _TorchInception3(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)
        self.Mixed_7a = _TInceptionD(768)
        self.Mixed_7b = _TInceptionE(1280)
        self.Mixed_7c = _TInceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = TF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = TF.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def test_inception_v3_weight_import_parity():
    torch.manual_seed(3)
    tm = _TorchInception3().eval()
    _randomize_bn_stats(tm)
    x = np.random.RandomState(3).rand(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # (B, 2048)

    params, stats = convert_torch_inception_state(tm.state_dict())
    fm = InceptionV3FE(with_gap=True)
    with jax.default_matmul_precision("highest"):
        out = fm.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-3)


def test_inception_transform_input_matches_formula():
    x = np.random.RandomState(4).rand(1, 8, 8, 3).astype(np.float32)
    fm = InceptionV3FE(transform_input=True)
    got = np.asarray(fm._transform(jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = x * (std / 0.5) + (mean - 0.5) / 0.5
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# registry + grayscale + family integration contracts
# ---------------------------------------------------------------------------

def test_registry_matches_reference_list():
    # koafusion/models/_core_fes.py:6-15
    assert set(FE_ARCHS) == {
        "squeezenet1_0", "vgg16", "densenet161", "inception_v3",
        "resnet18", "resnet34", "resnet50", "resnext50_32x4d"}
    assert FE_OUT_CHANNELS["squeezenet1_0"] == 512
    assert FE_OUT_CHANNELS["vgg16"] == 512
    assert FE_OUT_CHANNELS["densenet161"] == 2208
    assert FE_OUT_CHANNELS["inception_v3"] == 2048


@pytest.mark.parametrize("fe_cls", [SqueezeNetFE, VGGFE])
def test_grayscale_equals_rgb_repeat(fe_cls):
    fm = fe_cls(with_gap=True)
    gray = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 1),
                       jnp.float32)
    variables = fm.init(jax.random.key(1), gray)
    with jax.default_matmul_precision("highest"):
        out_gray = fm.apply(variables, gray, train=False)
        out_rgb = fm.apply(variables, jnp.repeat(gray, 3, axis=-1),
                           train=False)
    np.testing.assert_allclose(np.asarray(out_gray), np.asarray(out_rgb),
                               atol=1e-4)


def test_family_runs_with_new_arch_and_raises_without_gap():
    from oaprogressionmmf_tpu.models import dict_models

    cfg = {
        "name": "MR1CnnTrf",
        "input_size": [[64, 64, 2]],
        "downscale": False,
        "input_channels": 1,
        "output_channels": 2,
        "output_type": "main",
        "debug": False,
        "restore_weights": False,
        "fe": {"arch": "squeezenet1_0", "pretrained": False,
               "with_gap": True, "dropout": 0.0, "dims_view": "rc"},
        "agg": {"num_slices": [2], "depth": 1, "heads": 2,
                "emb_dropout": 0.0, "mlp_dim": 32, "mlp_dropout": 0.0},
    }
    x = jnp.asarray(np.random.RandomState(6).rand(1, 1, 64, 64, 2),
                    jnp.float32)
    model = dict_models["MR1CnnTrf"](config=cfg)
    variables = model.init(jax.random.key(2), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 2)

    # non-stride-32 arch with with_gap=false must fail loudly
    cfg_bad = dict(cfg, fe=dict(cfg["fe"], with_gap=False))
    model_bad = dict_models["MR1CnnTrf"](config=cfg_bad)
    with pytest.raises(ValueError, match="with_gap"):
        model_bad.init(jax.random.key(2), x, train=False)


def test_fe_spatial_oracle_arch_aware():
    """vgg16 (floor max-pools) and densenet161 (avg-pool transitions)
    downsample differently from resnet at sizes not divisible by 32; the
    static oracle must match each arch's actual output and raise on
    collapse-to-zero instead of mis-sizing the pos-embedding."""
    import pytest as _pytest

    from oaprogressionmmf_tpu.models.encoders import DenseNetFE, VGGFE
    from oaprogressionmmf_tpu.models.families import _fe_spatial

    assert _fe_spatial((350, 350), "vgg16") == (10, 10)
    assert _fe_spatial((350, 350), "densenet161") == (11, 11)
    assert _fe_spatial((350, 350), "resnet50") == (11, 11)
    assert _fe_spatial((50, 50), "vgg16") == (1, 1)
    assert _fe_spatial((50, 50), "resnet50") == (2, 2)
    for arch in ("vgg16", "densenet161"):
        with _pytest.raises(ValueError, match="collapses"):
            _fe_spatial((25, 25), arch)

    # oracle vs the real encoders at a size where the chains disagree
    x = jnp.ones((1, 50, 50, 3), jnp.float32)
    v = VGGFE(with_gap=False)
    out = v.apply(v.init(jax.random.key(0), x), x, train=False)
    assert out.shape[1:3] == _fe_spatial((50, 50), "vgg16")
    d = DenseNetFE(growth_rate=8, block_config=(2, 2, 2, 2),
                   num_init_features=16, with_gap=False)
    out = d.apply(d.init(jax.random.key(0), x), x, train=False)
    assert out.shape[1:3] == _fe_spatial((50, 50), "densenet161")
