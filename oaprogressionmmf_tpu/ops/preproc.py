"""Per-modality preprocessing: host-side crops + fused device-side float math.

Pipeline split (TPU-first, cf. SURVEY.md §7.2):
  * **host**: read uint8/uint16 volumes, RIGHT→LEFT flip, random/center crop
    — crop-before-transfer minimizes host→device bytes;
  * **device**: unit-range scaling, rotation, gamma correction,
    normalization, downscale — all pure jittable functions fused by XLA
    into the train step.

Semantics match the reference transform stacks assembled in
koafusion/datasets/_data_provider.py:286-418 (RandomCrop→ToUnitRange→
Rotate(±15°, p=.5)→[Gamma p=.5, not for T2]→Normalize per-modality;
val/test use CenterCrop and drop the stochastic steps), with the stochastic
state carried by explicit PRNG keys instead of `randomize()` calls.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .rotate import (rotate2d, rotate2d_affine, rotate3d_in_slice,
                     rotate3d_in_slice_affine)

# Per-modality normalization stats (koafusion/datasets/_data_provider.py:
# 323-338): mean/std measured on the OAI preprocessed intensities.
MODALITY_STATS = {
    "sag_3d_dess": (0.257, 0.235),
    "cor_iw_tse": (0.455, 0.290),
    "sag_t2_map": (0.259, 0.345),
    "xr_pa": (0.543, 0.296),
}

# Gamma correction is applied to every imaging modality except the T2 map
# (it is a quantitative map, cf. _data_provider.py:303-309).
MODALITY_WITH_GAMMA = {"sag_3d_dess", "cor_iw_tse", "xr_pa"}


# ---------------------------------------------------------------------------
# Host-side crops (numpy, channel-first)
# ---------------------------------------------------------------------------

def random_crop_np(img: np.ndarray, output_size: Sequence[int],
                   ratios: Sequence[float]) -> np.ndarray:
    """Crop (ch, d0, ...) with per-dim start = floor(ratio * (in - out)).

    `ratios` in [0, 1) replace the reference's `randomize()` state
    (koafusion/preproc/_np_nd.py:62-106).
    """
    ds_in = img.shape[1:]
    for d_in, d_out in zip(ds_in, output_size):
        if d_in < d_out:
            raise ValueError(
                f"Invalid crop size {tuple(output_size)} for input {ds_in}")
    starts = [math.floor(r * (i - o))
              for r, i, o in zip(ratios, ds_in, output_size)]
    sel = tuple([slice(None)] + [slice(s, s + o)
                                 for s, o in zip(starts, output_size)])
    return np.ascontiguousarray(img[sel])


def center_crop_np(img: np.ndarray, output_size: Sequence[int]) -> np.ndarray:
    """Center crop (ch, d0, ...) — koafusion/preproc/_np_nd.py:109-144."""
    ds_in = img.shape[1:]
    for d_in, d_out in zip(ds_in, output_size):
        if d_in < d_out:
            raise ValueError(
                f"Invalid crop size {tuple(output_size)} for input {ds_in}")
    offs = [(i - o) // 2 for i, o in zip(ds_in, output_size)]
    sel = tuple([slice(None)] + [slice(s, s + o)
                                 for s, o in zip(offs, output_size)])
    return np.ascontiguousarray(img[sel])


# ---------------------------------------------------------------------------
# Device-side jittable ops
# ---------------------------------------------------------------------------

def to_unit_range(image: jnp.ndarray) -> jnp.ndarray:
    """(x - min) / (max - min) over the whole tensor (PTToUnitRange)."""
    image = image.astype(jnp.float32)
    lo = jnp.min(image)
    hi = jnp.max(image)
    return (image - lo) / (hi - lo)


def normalize(image: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Per-channel (x - mean) / std, channel axis 0 (PTNormalize)."""
    mean = jnp.asarray(mean, jnp.float32).reshape((-1,) + (1,) * (image.ndim - 1))
    std = jnp.asarray(std, jnp.float32).reshape((-1,) + (1,) * (image.ndim - 1))
    return (image.astype(jnp.float32) - mean) / std


def gamma_correction(image: jnp.ndarray, gamma: jnp.ndarray,
                     clip_to_unit: bool = False) -> jnp.ndarray:
    """x ** (1/gamma) (PTGammaCorrection body)."""
    out = jnp.power(image, 1.0 / gamma)
    if clip_to_unit:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def _maybe(p: jnp.ndarray, prob: float, fn, image: jnp.ndarray) -> jnp.ndarray:
    """Apply fn with probability `prob` (branchless: both paths traced)."""
    return jnp.where(p < prob, fn(image), image)


def make_augment_fn(modality: str, *, degree_range=(-15.0, 15.0),
                    rot_prob=0.5, gamma_range=(0.5, 2.0), gamma_prob=0.5,
                    fast: bool = False):
    """Per-sample training augmentation: (cropped image, key) → float image.

    Input is the host-cropped channel-first array (CH,R,C) for XR or
    (CH,R,C,S) for MRI. Order matches the reference stacks: ToUnitRange →
    Rotate → [Gamma] → Normalize — computed in the folded form
    ``rot(unit(x)) == a·rot(x) + b·M`` (rotate2d_affine /
    rotate3d_in_slice_affine): the unit-range pass never materializes and
    the gamma/normalize chain fuses into the rotation epilogue. Exact up
    to f32 reassociation.

    ``fast=True`` (the post-downscale augment regime,
    training.augment_full_res=false) runs the gathers and pointwise math
    in bfloat16 — half the augment HBM traffic for ~1e-3 value error,
    below the bf16 cast the model applies to its inputs anyway. The
    reference-parity path keeps f32.
    """
    if modality == "clin":
        return lambda image, key: image.astype(jnp.float32)
    mean, std = MODALITY_STATS[modality]
    with_gamma = modality in MODALITY_WITH_GAMMA
    deg_lo, deg_hi = (math.radians(degree_range[0]),
                      math.radians(degree_range[1]))
    dt = jnp.bfloat16 if fast else jnp.float32
    # OAPROG_SHEAR_ROT=1 (fast path only): volume rotation as 3 banded
    # MXU matmul shears instead of VPU gathers — same rotation, slightly
    # different interpolation filtering (ops.rotate.rotate3d_in_slice_shear)
    import os
    use_shear = fast and os.environ.get("OAPROG_SHEAR_ROT") in ("1", "true")

    def augment(image: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        k_rotp, k_theta, k_gp, k_gamma = jax.random.split(key, 4)
        lo = jnp.min(image).astype(jnp.float32)
        hi = jnp.max(image).astype(jnp.float32)
        a1 = 1.0 / (hi - lo)
        b1 = -lo * a1

        theta = jax.random.uniform(k_theta, (), minval=deg_lo, maxval=deg_hi)
        if image.ndim == 3:
            rot_aff = rotate2d_affine
        elif use_shear:
            from .rotate import rotate3d_in_slice_shear_affine
            rot_aff = rotate3d_in_slice_shear_affine
        else:
            rot_aff = rotate3d_in_slice_affine
        p_rot = jax.random.uniform(k_rotp, ())
        rotated = rot_aff(image, theta, a1, b1, dtype=dt)   # unit + rotate
        plain = image.astype(dt) * a1.astype(dt) + b1.astype(dt)
        u = jnp.where(p_rot < rot_prob, rotated, plain)

        if with_gamma:
            gamma = jax.random.uniform(k_gamma, (), minval=gamma_range[0],
                                       maxval=gamma_range[1])
            p_g = jax.random.uniform(k_gp, ())
            # the folded rotate can round to -eps where the unfolded form
            # was exactly 0 (border taps); pow(-eps, 1/g) is NaN — clamp
            # to the unfolded form's [0, 1] domain
            u_pos = jnp.maximum(u, jnp.asarray(0.0, dt))
            u = jnp.where(p_g < gamma_prob,
                          jnp.power(u_pos, (1.0 / gamma).astype(dt)), u)

        return (u - jnp.asarray(mean, dt)) / jnp.asarray(std, dt)

    return augment


def make_eval_preproc_fn(modality: str):
    """Val/test device preprocessing: ToUnitRange → Normalize (no stochastic)."""
    if modality == "clin":
        return lambda image: image.astype(jnp.float32)
    mean, std = MODALITY_STATS[modality]

    def preproc(image: jnp.ndarray) -> jnp.ndarray:
        return normalize(to_unit_range(image), [mean], [std])

    return preproc


def percentile_clip(image: jnp.ndarray, cut_min: float, cut_max: float,
                    to_unit_range: bool = False) -> jnp.ndarray:
    """Clip intensities to [cut_min, cut_max] percentiles
    (PTPercentileClip, koafusion/preproc/_pt.py:7-72; linear-interpolated
    percentiles like the reference's sorted-lerp implementation)."""
    image = image.astype(jnp.float32)
    lo, hi = jnp.percentile(image, jnp.asarray([cut_min, cut_max]))
    out = jnp.clip(image, lo, hi)
    if to_unit_range:
        out = (out - lo) / (hi - lo)
    return out


def denormalize(image: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Inverse of :func:`normalize` (PTDenormalize)."""
    mean = jnp.asarray(mean, jnp.float32).reshape((-1,) + (1,) * (image.ndim - 1))
    std = jnp.asarray(std, jnp.float32).reshape((-1,) + (1,) * (image.ndim - 1))
    return image.astype(jnp.float32) * std + mean


def reproject(image: jnp.ndarray, dims_in, dims_out) -> jnp.ndarray:
    """Axis permutation (Reproject/PTReproject)."""
    return jnp.moveaxis(image, dims_in, dims_out)


def random_flip(image: jnp.ndarray, key, prob: float = 0.5) -> jnp.ndarray:
    """Randomly flip a random subset of the non-channel axes (Flip,
    koafusion/preproc/_np_nd.py:6-37): one gate probability, then an
    independent coin per spatial axis."""
    k_p, k_axes = jax.random.split(key)
    p = jax.random.uniform(k_p, ())
    n_spatial = image.ndim - 1
    coins = jax.random.bernoulli(k_axes, 0.5, (n_spatial,))
    out = image
    for ax in range(1, image.ndim):
        do = (p < prob) & coins[ax - 1]
        out = jnp.where(do, jnp.flip(out, axis=ax), out)
    return out
