"""Non-ResNet feature extractors: SqueezeNet1.0, VGG16, DenseNet161,
Inception v3 — flax, NHWC, bf16-capable.

Completes the FE registry to the reference's full set
(koafusion/models/_core_fes.py:6-15).  The reference registers these four
via torchvision but its transformer consumers only *support* the ResNets
(`_mrN_cnn_trf.py:97-102` raises "Unsupported `model.fe.arch`" otherwise);
here each is a first-class encoder with the framework's uniform contract:

    fe(x, train)  with x: (B, H, W, 1|3) NHWC
      with_gap=True  → pooled features (B, C)
      with_gap=False → final feature maps (B, h, w, C)

TPU-first choices mirror `models/resnet.py`: NHWC end-to-end, a `dtype`
knob for bf16 MXU math with float32 params/BN stats, and grayscale inputs
handled by folding the RGB stem kernel (sum over the input-channel axis —
numerically identical to the reference's gray→3-channel repeat,
`_mrN_cnn_trf.py:109`, without the 3x HBM traffic).

`convert_torch_*_state` functions import torchvision-format state_dicts
(the reference's ImageNet model-zoo checkpoints) into these modules.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ModuleDef = Any


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _ceil_pool_pad(n: int, window: int, stride: int) -> int:
    """Right/bottom padding emulating torch MaxPool2d(ceil_mode=True)."""
    rem = (n - window) % stride
    if rem == 0:
        return 0
    # torch guarantees the last window starts inside the input; with
    # window > stride (3 vs 2 everywhere here) that always holds
    return stride - rem


def _max_pool_ceil(x, window: int = 3, stride: int = 2):
    ph = _ceil_pool_pad(x.shape[1], window, stride)
    pw = _ceil_pool_pad(x.shape[2], window, stride)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, ph), (0, pw)))


class _RGBStemConv(nn.Module):
    """First conv with an ImageNet (kh, kw, 3, F) kernel that accepts
    grayscale directly by summing the kernel over its input channels
    (exact equivalent of repeating gray→RGB; cf. resnet._StemConv)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            self.kernel_size + (3, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        if x.shape[-1] == 1:
            k = jnp.sum(k, axis=2, keepdims=True)
        elif x.shape[-1] != 3:
            raise ValueError(f"Stem expects 1 or 3 channels, got {x.shape}")
        y = jax.lax.conv_general_dilated(
            x, k, self.strides, list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _tree_put(tree: dict, path: tuple, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(v) -> jnp.ndarray:
    """torch conv (O, I, kh, kw) → flax (kh, kw, I, O)."""
    return jnp.asarray(np.transpose(np.asarray(v), (2, 3, 1, 0)))


def _import_bn(params: dict, stats: dict, path: tuple, sd: dict, key: str):
    _tree_put(params, path + ("scale",), jnp.asarray(sd[key + ".weight"]))
    _tree_put(params, path + ("bias",), jnp.asarray(sd[key + ".bias"]))
    _tree_put(stats, path + ("mean",), jnp.asarray(sd[key + ".running_mean"]))
    _tree_put(stats, path + ("var",), jnp.asarray(sd[key + ".running_var"]))


# ---------------------------------------------------------------------------
# SqueezeNet 1.0
# ---------------------------------------------------------------------------

class Fire(nn.Module):
    """squeeze 1x1 → ReLU → [expand 1x1 ‖ expand 3x3] → ReLU, concat."""

    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32)
        s = nn.relu(conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(conv(self.expand1x1, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(conv(self.expand3x3, (3, 3),
                          padding=((1, 1), (1, 1)), name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


# (squeeze, expand1x1, expand3x3) per Fire, with 'M' = ceil-mode max-pool —
# the torchvision squeezenet1_0 `features` stack
_SQUEEZENET10_PLAN = (
    "M",
    (16, 64, 64), (16, 64, 64), (32, 128, 128),
    "M",
    (32, 128, 128), (48, 192, 192), (48, 192, 192), (64, 256, 256),
    "M",
    (64, 256, 256),
)


class SqueezeNetFE(nn.Module):
    """SqueezeNet 1.0 feature extractor (torchvision `features`):
    conv 7x7/2 (valid) → ReLU → [pool/Fire plan] → 512-ch maps."""

    with_gap: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN anywhere in squeezenet
        x = x.astype(self.dtype)
        x = _RGBStemConv(features=96, kernel_size=(7, 7), strides=(2, 2),
                         dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        fire_idx = 0
        for item in _SQUEEZENET10_PLAN:
            if item == "M":
                x = _max_pool_ceil(x)
            else:
                sq, e1, e3 = item
                x = Fire(sq, e1, e3, dtype=self.dtype,
                         name=f"fire{fire_idx}")(x)
                fire_idx += 1
        if self.with_gap:
            x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)


def convert_torch_squeezenet_state(sd: dict) -> tuple[dict, dict]:
    """torchvision squeezenet1_0 state_dict → (flax params, {}).

    torchvision indices: features.0 = stem conv; Fire modules at
    features.{3,4,5,7,8,9,10,12} with squeeze/expand1x1/expand3x3 convs.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if k.startswith("features.")}
    params: dict = {}
    _tree_put(params, ("conv1", "kernel"), _conv_w(sd["features.0.weight"]))
    _tree_put(params, ("conv1", "bias"), jnp.asarray(sd["features.0.bias"]))
    fire_positions = [3, 4, 5, 7, 8, 9, 10, 12]
    for fi, pos in enumerate(fire_positions):
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            _tree_put(params, (f"fire{fi}", sub, "kernel"),
                      _conv_w(sd[f"features.{pos}.{sub}.weight"]))
            _tree_put(params, (f"fire{fi}", sub, "bias"),
                      jnp.asarray(sd[f"features.{pos}.{sub}.bias"]))
    return params, {}


# ---------------------------------------------------------------------------
# VGG16
# ---------------------------------------------------------------------------

# torchvision vgg16 'D' configuration; numbers are conv widths, 'M' pools
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")


class VGGFE(nn.Module):
    """VGG16 feature extractor (torchvision `features`): 13 3x3 convs with
    bias + 5 max-pools → 512-ch stride-32 maps."""

    with_gap: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # the registered vgg16 variant has no BN
        x = x.astype(self.dtype)
        ci = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif ci == 0:
                x = nn.relu(_RGBStemConv(
                    features=item, kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv0")(x))
                ci += 1
            else:
                x = nn.relu(nn.Conv(
                    item, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"conv{ci}")(x))
                ci += 1
        if self.with_gap:
            x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)


def convert_torch_vgg_state(sd: dict) -> tuple[dict, dict]:
    """torchvision vgg16 state_dict → (flax params, {}).

    Conv layers sit at features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if k.startswith("features.")}
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: dict = {}
    for ci, pos in enumerate(conv_positions):
        _tree_put(params, (f"conv{ci}", "kernel"),
                  _conv_w(sd[f"features.{pos}.weight"]))
        _tree_put(params, (f"conv{ci}", "bias"),
                  jnp.asarray(sd[f"features.{pos}.bias"]))
    return params, {}


# ---------------------------------------------------------------------------
# DenseNet161
# ---------------------------------------------------------------------------

class DenseLayer(nn.Module):
    """BN → ReLU → 1x1 (bn_size·growth) → BN → ReLU → 3x3 (growth)."""

    growth_rate: int
    bn_size: int
    norm: ModuleDef
    conv: ModuleDef

    @nn.compact
    def __call__(self, x):
        y = nn.relu(self.norm(name="norm1")(x))
        y = self.conv(self.bn_size * self.growth_rate, (1, 1),
                      name="conv1")(y)
        y = nn.relu(self.norm(name="norm2")(y))
        y = self.conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetFE(nn.Module):
    """DenseNet-161 feature extractor (torchvision `features`):
    96-ch 7x7/2 stem, blocks (6, 12, 36, 24) at growth 48 with 0.5-compression
    transitions, final BN → 2208-ch stride-32 maps.

    with_gap=True applies the torchvision classifier-entry semantics
    (ReLU → global average pool); with_gap=False returns the post-norm5
    maps (what `children()[:-1]` exposes)."""

    growth_rate: int = 48
    block_config: Sequence[int] = (6, 12, 36, 24)
    num_init_features: int = 96
    bn_size: int = 4
    with_gap: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = _RGBStemConv(features=self.num_init_features, kernel_size=(7, 7),
                         strides=(2, 2), padding=((3, 3), (3, 3)),
                         use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(norm(name="norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = self.num_init_features
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size, norm, conv,
                               name=f"denseblock{bi + 1}_layer{li + 1}")(x)
            features += n_layers * self.growth_rate
            if bi != len(self.block_config) - 1:
                features = features // 2
                x = nn.relu(norm(name=f"transition{bi + 1}_norm")(x))
                x = conv(features, (1, 1),
                         name=f"transition{bi + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = norm(name="norm5")(x)

        if self.with_gap:
            x = jnp.mean(nn.relu(x), axis=(1, 2))
        return x.astype(self.dtype)


def convert_torch_densenet_state(sd: dict) -> tuple[dict, dict]:
    """torchvision densenet state_dict → (flax params, batch_stats).

    The block configuration is inferred from the keys, so any densenet
    variant imports (161 in the registry: blocks (6, 12, 36, 24))."""
    sd = {k: np.asarray(v) for k, v in sd.items()
          if k.startswith("features.")}
    params: dict = {}
    stats: dict = {}
    _tree_put(params, ("conv0", "kernel"),
              _conv_w(sd["features.conv0.weight"]))
    _import_bn(params, stats, ("norm0",), sd, "features.norm0")

    block_config = []
    bi = 1
    while any(k.startswith(f"features.denseblock{bi}.") for k in sd):
        li = 1
        while any(k.startswith(f"features.denseblock{bi}.denselayer{li}.")
                  for k in sd):
            li += 1
        block_config.append(li - 1)
        bi += 1
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            tpre = f"features.denseblock{bi}.denselayer{li}"
            fname = f"denseblock{bi}_layer{li}"
            _import_bn(params, stats, (fname, "norm1"), sd, tpre + ".norm1")
            _tree_put(params, (fname, "conv1", "kernel"),
                      _conv_w(sd[tpre + ".conv1.weight"]))
            _import_bn(params, stats, (fname, "norm2"), sd, tpre + ".norm2")
            _tree_put(params, (fname, "conv2", "kernel"),
                      _conv_w(sd[tpre + ".conv2.weight"]))
        if bi != len(block_config):
            _import_bn(params, stats, (f"transition{bi}_norm",), sd,
                       f"features.transition{bi}.norm")
            _tree_put(params, (f"transition{bi}_conv", "kernel"),
                      _conv_w(sd[f"features.transition{bi}.conv.weight"]))
    _import_bn(params, stats, ("norm5",), sd, "features.norm5")
    return params, stats


# ---------------------------------------------------------------------------
# Inception v3
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    """Conv (no bias) → BN(eps=1e-3) → ReLU, the inception building block."""

    features: int
    kernel_size: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32
    grayscale_ok: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.grayscale_ok:
            y = _RGBStemConv(features=self.features,
                             kernel_size=self.kernel_size,
                             strides=self.strides, padding=self.padding,
                             use_bias=False, dtype=self.dtype,
                             name="conv")(x)
        else:
            y = nn.Conv(self.features, self.kernel_size,
                        strides=self.strides, padding=list(self.padding),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        return nn.relu(y)


def _avg_pool_3x3_count_excl_pad(x):
    """torch AvgPool2d(3, 1, 1) default count_include_pad=True."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = partial(BasicConv2d, dtype=self.dtype)
        b1 = c(64, name="branch1x1")(x, train)
        b5 = c(48, name="branch5x5_1")(x, train)
        b5 = c(64, (5, 5), padding=((2, 2), (2, 2)),
               name="branch5x5_2")(b5, train)
        b3 = c(64, name="branch3x3dbl_1")(x, train)
        b3 = c(96, (3, 3), padding=((1, 1), (1, 1)),
               name="branch3x3dbl_2")(b3, train)
        b3 = c(96, (3, 3), padding=((1, 1), (1, 1)),
               name="branch3x3dbl_3")(b3, train)
        bp = _avg_pool_3x3_count_excl_pad(x)
        bp = c(self.pool_features, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = partial(BasicConv2d, dtype=self.dtype)
        b3 = c(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train)
        bd = c(64, name="branch3x3dbl_1")(x, train)
        bd = c(96, (3, 3), padding=((1, 1), (1, 1)),
               name="branch3x3dbl_2")(bd, train)
        bd = c(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = c(192, name="branch1x1")(x, train)
        b7 = c(c7, name="branch7x7_1")(x, train)
        b7 = c(c7, (1, 7), padding=p17, name="branch7x7_2")(b7, train)
        b7 = c(192, (7, 1), padding=p71, name="branch7x7_3")(b7, train)
        bd = c(c7, name="branch7x7dbl_1")(x, train)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd, train)
        bd = c(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd, train)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd, train)
        bd = c(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd, train)
        bp = _avg_pool_3x3_count_excl_pad(x)
        bp = c(192, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = partial(BasicConv2d, dtype=self.dtype)
        b3 = c(192, name="branch3x3_1")(x, train)
        b3 = c(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3, train)
        b7 = c(192, name="branch7x7x3_1")(x, train)
        b7 = c(192, (1, 7), padding=((0, 0), (3, 3)),
               name="branch7x7x3_2")(b7, train)
        b7 = c(192, (7, 1), padding=((3, 3), (0, 0)),
               name="branch7x7x3_3")(b7, train)
        b7 = c(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = partial(BasicConv2d, dtype=self.dtype)
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = c(320, name="branch1x1")(x, train)
        b3 = c(384, name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            c(384, (1, 3), padding=p13, name="branch3x3_2a")(b3, train),
            c(384, (3, 1), padding=p31, name="branch3x3_2b")(b3, train),
        ], axis=-1)
        bd = c(448, name="branch3x3dbl_1")(x, train)
        bd = c(384, (3, 3), padding=((1, 1), (1, 1)),
               name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            c(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd, train),
            c(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd, train),
        ], axis=-1)
        bp = _avg_pool_3x3_count_excl_pad(x)
        bp = c(192, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FE(nn.Module):
    """Inception v3 trunk (torchvision stem → Mixed_7c, no aux/fc):
    (B, H, W, 1|3) → 2048-ch maps or pooled vector.

    `transform_input` replays torchvision's pretrained input renorm
    (ImageNet-stats affine per channel); a grayscale input is treated as
    the same value in all three channels."""

    with_gap: bool = True
    transform_input: bool = False
    dtype: Any = jnp.float32

    def _transform(self, x):
        # torchvision Inception3._transform_input: unscale from the
        # [0,1]+ImageNet-normalized convention to inception's own
        scale = jnp.asarray([0.229, 0.224, 0.225], self.dtype) / 0.5
        shift = (jnp.asarray([0.485, 0.456, 0.406], self.dtype) - 0.5) / 0.5
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return x * scale + shift

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        c = partial(BasicConv2d, dtype=self.dtype)
        if self.transform_input:
            x = self._transform(x)
            stem = c(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")
        else:
            stem = c(32, (3, 3), strides=(2, 2), grayscale_ok=True,
                     name="Conv2d_1a_3x3")
        x = stem(x, train)
        x = c(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = c(64, (3, 3), padding=((1, 1), (1, 1)),
              name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = c(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=self.dtype, name="Mixed_7c")(x, train)

        if self.with_gap:
            x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)


def convert_torch_inception_state(sd: dict) -> tuple[dict, dict]:
    """torchvision inception_v3 state_dict → (flax params, batch_stats).

    Maps every `<Block>.<branch>.conv/bn` to the flax module of the same
    name; aux-classifier and fc weights are dropped (FE use only).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith(("AuxLogits.", "fc."))
          and not k.endswith("num_batches_tracked")}
    params: dict = {}
    stats: dict = {}
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in sd if k.endswith(".conv.weight")})
    for pre in prefixes:
        path = tuple(pre.split("."))
        _tree_put(params, path + ("conv", "kernel"),
                  _conv_w(sd[pre + ".conv.weight"]))
        _import_bn(params, stats, path + ("bn",), sd, pre + ".bn")
    return params, stats


# ---------------------------------------------------------------------------
# registry fragments (merged into models.resnet.FE_ARCHS)
# ---------------------------------------------------------------------------

def squeezenet1_0(**kw):
    kw.pop("remat", None)  # no residual blocks to remat
    return SqueezeNetFE(**kw)


def vgg16(**kw):
    kw.pop("remat", None)
    return VGGFE(**kw)


def densenet161(**kw):
    kw.pop("remat", None)
    return DenseNetFE(**kw)


def inception_v3(**kw):
    kw.pop("remat", None)
    return InceptionV3FE(**kw)


EXTRA_FE_ARCHS = {
    "squeezenet1_0": squeezenet1_0,
    "vgg16": vgg16,
    "densenet161": densenet161,
    "inception_v3": inception_v3,
}

EXTRA_FE_OUT_CHANNELS = {
    "squeezenet1_0": 512,
    "vgg16": 512,
    "densenet161": 2208,
    "inception_v3": 2048,
}
