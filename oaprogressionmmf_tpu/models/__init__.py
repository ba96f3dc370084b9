"""Model registry — name → flax module class.

Mirrors the reference registry (koafusion/models/__init__.py:8-15) so the
train/eval layers stay model-agnostic: `dict_models[config.model.name]`.
"""

from .families import (
    FeatC1, MR1CnnTrf, MR2CnnTrf, XR1Cnn, XR1MR1CnnTrf, XR1MR2C1CnnTrf,
    XR1MR2CnnTrf,
)
from .feat import Attention, FeaT, FeedForward, Transformer
from .resnet import (
    FE_ARCHS, FE_OUT_CHANNELS, ResNetFE, convert_torch_resnet_state,
    resnet18, resnet34, resnet50, resnext50_32x4d,
)

dict_models = {
    "XR1Cnn": XR1Cnn,
    "MR1CnnTrf": MR1CnnTrf,
    "MR2CnnTrf": MR2CnnTrf,
    "XR1MR1CnnTrf": XR1MR1CnnTrf,
    "XR1MR2CnnTrf": XR1MR2CnnTrf,
    "XR1MR2C1CnnTrf": XR1MR2C1CnnTrf,
}

# Modality arity per family: how many input arrays the forward takes,
# in config.data.sets.n0.modals order (matches runner.sh usage).
MODEL_ARITY = {
    "XR1Cnn": 1,
    "MR1CnnTrf": 1,
    "MR2CnnTrf": 2,
    "XR1MR1CnnTrf": 2,
    "XR1MR2CnnTrf": 3,
    "XR1MR2C1CnnTrf": 4,
}

__all__ = [
    "dict_models", "MODEL_ARITY",
    "XR1Cnn", "MR1CnnTrf", "MR2CnnTrf", "XR1MR1CnnTrf", "XR1MR2CnnTrf",
    "XR1MR2C1CnnTrf", "FeatC1",
    "FeaT", "Attention", "FeedForward", "Transformer",
    "ResNetFE", "FE_ARCHS", "FE_OUT_CHANNELS", "convert_torch_resnet_state",
    "resnet18", "resnet34", "resnet50", "resnext50_32x4d",
]
