"""int8 post-training quantization primitives (serving path).

v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (measured on-chip:
scripts/exp_int8.py). Scheme shared by the conv FEs (models/resnet.py)
and the FeaT dense stacks (models/feat.py):

  * per-output-channel symmetric weight scales, computed from the f32
    kernel at apply time (weight traffic is negligible next to
    activations);
  * a static per-layer activation scale from calibration: mode "calib"
    records running amax into the `quant_acts` flax variable collection;
    mode "int8" consumes it (zero extra activation passes at serving);
  * all non-contraction math (BN, LN, softmax, residuals, bias) stays in
    the module's compute dtype — parameter trees are unchanged, so
    checkpoints are oblivious to quantization.

Eval-only: training never quantizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_sym(x, scale):
    """Symmetric int8 quantization; `scale` broadcasts (scalar or last-dim
    per-channel)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _amax_var(mdl):
    return mdl.variable("quant_acts", "amax",
                        lambda: jnp.zeros((), jnp.float32))


def quant_conv_apply(mdl, x, kernel_f32, strides, padding, groups, dtype,
                     quant):
    """Conv executor for the three modes (None/calib/int8); creates the
    `quant_acts/amax` variable in `mdl`'s scope when quant is active."""
    dn = ("NHWC", "HWIO", "NHWC")
    if quant in ("calib", "int8"):
        amax = _amax_var(mdl)
        if quant == "calib":
            if not mdl.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        else:
            s_in = jnp.maximum(amax.value, 1e-6) / 127.0
            s_w = jnp.maximum(
                jnp.max(jnp.abs(kernel_f32), axis=(0, 1, 2)), 1e-8) / 127.0
            y = jax.lax.conv_general_dilated(
                quantize_sym(x, s_in), quantize_sym(kernel_f32, s_w),
                strides, padding, feature_group_count=groups,
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (s_in * s_w)).astype(dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel_f32.astype(dtype), strides, padding,
        feature_group_count=groups, dimension_numbers=dn)


def quant_dense_apply(mdl, x, kernel_f32, bias_f32, dtype, quant):
    """Dense executor for the three modes; same contract as
    :func:`quant_conv_apply` (bias added in `dtype`)."""
    if quant in ("calib", "int8"):
        amax = _amax_var(mdl)
        if quant == "calib":
            if not mdl.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        else:
            s_in = jnp.maximum(amax.value, 1e-6) / 127.0
            s_w = jnp.maximum(
                jnp.max(jnp.abs(kernel_f32), axis=0), 1e-8) / 127.0
            y = jax.lax.dot_general(
                quantize_sym(x, s_in), quantize_sym(kernel_f32, s_w),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (s_in * s_w)).astype(dtype)
            if bias_f32 is not None:
                y = y + bias_f32.astype(dtype)
            return y
    y = jnp.dot(x.astype(dtype), kernel_f32.astype(dtype))
    if bias_f32 is not None:
        y = y + bias_f32.astype(dtype)
    return y
