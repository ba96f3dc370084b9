from .resize import interpolate
from .rotate import rotate2d, rotate3d_in_slice
from .preproc import (
    to_unit_range, normalize, denormalize, gamma_correction, percentile_clip,
    reproject, random_flip, center_crop_np, random_crop_np, make_augment_fn,
    make_eval_preproc_fn,
)
from .losses import focal_loss, cross_entropy_loss, dict_losses
from .schedules import (
    custom_warmup_static_decay, custom_warmup_multistep, dict_schedulers,
    make_lr_schedule,
)
from .t2_fit import fit_t2_map, fit_exp_linear
from .flash_attention import flash_attention, attention_reference

__all__ = [
    "interpolate", "rotate2d", "rotate3d_in_slice",
    "to_unit_range", "normalize", "denormalize", "gamma_correction",
    "percentile_clip", "reproject", "random_flip",
    "center_crop_np", "random_crop_np", "make_augment_fn",
    "make_eval_preproc_fn",
    "focal_loss", "cross_entropy_loss", "dict_losses",
    "custom_warmup_static_decay", "custom_warmup_multistep",
    "dict_schedulers", "make_lr_schedule",
    "fit_t2_map", "fit_exp_linear",
    "flash_attention", "attention_reference",
]
