"""Torch-parity linear/bilinear/trilinear resize as MXU matmuls.

The reference's "last-chance preprocessing" downscales batches on device with
`torch.nn.functional.interpolate(scale_factor=f, recompute_scale_factor=True,
align_corners=False, mode=linear|bilinear|trilinear)`
(koafusion/preproc/_pt.py:175-200). Numeric parity matters: the model's
static shape tables assume exactly `out = floor(in * f)` and the
half-pixel-center source mapping `src = (dst + 0.5) * in/out - 0.5` (clamped
at 0), which is what this module reproduces.

TPU-first design: shapes are static under jit, so each axis's interpolation
is a precomputed (out, in) matrix applied with `dot_general` — separable
resize becomes a chain of small matmuls that XLA maps straight onto the MXU,
instead of the gather-heavy form a direct translation would produce.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(size_in: int, size_out: int) -> np.ndarray:
    """(out, in) linear-interpolation matrix, align_corners=False."""
    scale = size_in / size_out
    dst = np.arange(size_out, dtype=np.float64)
    src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, size_in - 1)
    i1 = np.minimum(i0 + 1, size_in - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    mat = np.zeros((size_out, size_in), dtype=np.float32)
    mat[np.arange(size_out), i0] += w0.astype(np.float32)
    mat[np.arange(size_out), i1] += w1.astype(np.float32)
    return mat


def _resize_axis(x: jnp.ndarray, axis: int, size_out: int) -> jnp.ndarray:
    size_in = x.shape[axis]
    if size_in == size_out:
        return x
    mat = jnp.asarray(_interp_matrix(size_in, size_out))
    moved = jnp.moveaxis(x, axis, -1)
    # full-precision dot by default: resize parity with torch is semantic
    # (the downscale chain feeds value-sensitive normalization). The env
    # knob trades parity for MXU speed on the TPU path (the interp matrix
    # has <=2 nonzeros per row, so even bf16 error stays ~1e-3 relative).
    import os
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[
        os.environ.get("OAPROG_RESIZE_PRECISION", "highest").lower()]
    out = jnp.einsum("...i,oi->...o", moved, mat.astype(x.dtype),
                     precision=prec)
    return jnp.moveaxis(out, -1, axis)


def interpolate_fast(x: jnp.ndarray, scale_factor,
                     out_dtype=jnp.float32) -> jnp.ndarray:
    """Serving-fast resize: bf16 MXU dots with f32 accumulation.

    Same separable (out, in)-matrix chain as :func:`interpolate` but the
    operands ride the MXU in bf16 (f32 accumulate) instead of a multi-pass
    f32 HIGHEST decomposition — measured 24.1 → 17.3 ms on the flagship
    batch-64 eval preprocessing (BENCH_NOTES round 3). NOT bit-exact: the
    first dot is lossless for uint8-origin values (ints ≤255 and 0.5-band
    weights are exact in bf16) but intermediate half-integers round,
    compounding to ~1e-2 of the value range after normalization. Used only
    in the int8-serving regime (testing.quant=int8 / bench default) where
    activation quantization already dominates that error; the exact f32
    chain stays the default everywhere else (OAPROG_FAST_PREPROC=0/1
    overrides).
    """
    spatial = x.ndim - 2
    if isinstance(scale_factor, (int, float)):
        scale_factor = (float(scale_factor),) * spatial
    out = x
    for d, f in enumerate(scale_factor):
        axis = 2 + d
        size_in = out.shape[axis]
        size_out = int(math.floor(size_in * f))
        if size_out == size_in:
            continue
        mat = jnp.asarray(_interp_matrix(size_in, size_out),
                          dtype=jnp.bfloat16)
        # bf16 carries between dots: halves the intermediate HBM traffic
        # (the bulk of the win); each dot accumulates in f32 on the MXU
        moved = jnp.moveaxis(out, axis, -1).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            moved, mat.T, (((moved.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = jnp.moveaxis(y, -1, axis).astype(jnp.bfloat16)
    # out_dtype=bf16 lets a bf16 consumer (the fast train augment) read
    # the last dot's output without a f32 round-trip materialization
    return out.astype(out_dtype)


def interpolate(x: jnp.ndarray, scale_factor) -> jnp.ndarray:
    """Resize the spatial dims of (B, CH, D0[, D1[, D2]]) like torch.

    ``scale_factor`` is a float or a per-spatial-dim tuple; output size is
    ``floor(in * f)`` per dim (torch ``recompute_scale_factor=True``).
    """
    spatial = x.ndim - 2
    if spatial not in (1, 2, 3):
        raise ValueError(f"Expected 3-5D input (B, CH, spatial...), got {x.shape}")
    if isinstance(scale_factor, (int, float)):
        scale_factor = (float(scale_factor),) * spatial
    if len(scale_factor) != spatial:
        raise ValueError("scale_factor length must match spatial rank")

    # NOTE on exact halving (all production downscales are f=0.5 on even
    # extents, where the interp matrix is exactly [0.5, 0.5] rows): both
    # "obvious" cheaper forms measured SLOWER than this matmul chain on
    # v5e at the flagship batch-64 workload — per-axis reshape+mean 52.1
    # ms and one fused lax.reduce_window 46.3 ms vs 33.9 ms for the
    # einsums (BENCH_NOTES round 3). The (out, in) contraction rides the
    # MXU; the pooling forms bottleneck on VPU/layout shuffles. Keep the
    # matmul form.
    # (Axis reordering — innermost/most-reducing first — also measured
    # slightly WORSE (39.2 ms); XLA already folds the moveaxis into the
    # dot's dimension permutation. Natural order kept.)
    out = x
    for d, f in enumerate(scale_factor):
        axis = 2 + d
        size_out = int(math.floor(x.shape[axis] * f))
        out = _resize_axis(out, axis, size_out)
    return out
