"""int8 post-training quantization primitives (serving path).

v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (measured on-chip:
scripts/exp_int8.py). Scheme shared by the conv FEs (models/resnet.py)
and the FeaT dense stacks (models/feat.py):

  * per-output-channel symmetric weight scales, computed from the f32
    kernel at apply time (weight traffic is negligible next to
    activations);
  * static per-ACTIVATION-TENSOR scales from calibration: mode "calib"
    records running amax into the `quant_acts` flax variable collection;
    mode "int8" consumes it (zero extra activation passes at serving);
  * int8 activation RESIDENCY in the conv FEs: each inter-op tensor is
    materialized as int8 (`QTensor`), with the dequant -> BN -> relu ->
    requant chain fusing into the producing conv's epilogue — measured
    ~8% faster than bf16-resident activations on resnet50 stage1 at the
    flagship slice-batch shapes (scripts/exp_int8_residency.py). BN/LN/
    softmax/residual math runs in f32/bf16 inside the fusion; parameter
    trees are unchanged, so checkpoints are oblivious. The `quant_acts`
    tree is keyed by activation SITE (amax_in/amax_1/.../amax_out at
    block scope), not by consuming conv.

Eval-only: training never quantizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """An int8-resident activation: `data` int8, `scale` scalar f32
    (value = data * scale)."""

    data: jnp.ndarray
    scale: jnp.ndarray


def quantize_sym(x, scale):
    """Symmetric int8 quantization; `scale` broadcasts (scalar or last-dim
    per-channel)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequant(x, dtype=jnp.float32):
    """QTensor -> dense tensor in `dtype`; passthrough for plain arrays."""
    if isinstance(x, QTensor):
        return (x.data.astype(jnp.float32) * x.scale).astype(dtype)
    return x


def _calib_stat(x, quant):
    """Per-batch calibration statistic of |x|: absolute max for plain
    "calib"; a percentile for "calib:pNN.N" (e.g. "calib:p99.9"), which
    clips activation outliers so the int8 range isn't wasted on them —
    the running max across batches is taken by the caller either way."""
    ax = jnp.abs(x.astype(jnp.float32))
    if ":p" in quant:
        pct = float(quant.split(":p", 1)[1])
        return jnp.quantile(ax.reshape(-1), pct / 100.0)
    return jnp.max(ax)


def _is_calib(quant):
    return quant is not None and quant.startswith("calib")


def act_quant(mdl, x, name, quant):
    """Activation-site quantization point, declared in `mdl`'s scope.

    quant "calib" (or "calib:pNN.N"): record the running calibration
    statistic of |x| into quant_acts[name], return x unchanged (the
    calibration graph stays float).
    quant == "int8": read the calibrated amax, return `x` requantized as a
    QTensor — under jit this fuses into the producer's epilogue so only
    the int8 tensor is materialized.
    otherwise: identity (no variable declared).
    """
    if not (_is_calib(quant) or quant == "int8"):
        return x
    var = mdl.variable("quant_acts", name, lambda: jnp.zeros((), jnp.float32))
    if _is_calib(quant):
        if not mdl.is_initializing():
            var.value = jnp.maximum(var.value, _calib_stat(x, quant))
        return x
    s = jnp.maximum(var.value, 1e-6) / 127.0
    if isinstance(x, QTensor):          # already resident at this scale
        return x
    return QTensor(quantize_sym(x, s), s)


def quant_conv_apply(mdl, x, kernel_f32, strides, padding, groups, dtype,
                     quant):
    """Conv executor: QTensor input → s8xs8→s32 conv, f32 scaled output
    (the caller's BN/relu/requant fuse into the epilogue); plain input →
    plain conv in `dtype` (the calib graph and the unquantized path)."""
    dn = ("NHWC", "HWIO", "NHWC")
    if isinstance(x, QTensor):
        s_w = jnp.maximum(
            jnp.max(jnp.abs(kernel_f32), axis=(0, 1, 2)), 1e-8) / 127.0
        y = jax.lax.conv_general_dilated(
            x.data, quantize_sym(kernel_f32, s_w),
            strides, padding, feature_group_count=groups,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (x.scale * s_w)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel_f32.astype(dtype), strides, padding,
        feature_group_count=groups, dimension_numbers=dn)


def quant_dense_apply(mdl, x, kernel_f32, bias_f32, dtype, quant):
    """Dense executor for the FeaT stacks (per-dense amax recorded in the
    dense module's own scope; bias added in `dtype`)."""
    if _is_calib(quant) or quant == "int8":
        amax = mdl.variable("quant_acts", "amax",
                            lambda: jnp.zeros((), jnp.float32))
        if _is_calib(quant):
            if not mdl.is_initializing():
                amax.value = jnp.maximum(amax.value, _calib_stat(x, quant))
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
