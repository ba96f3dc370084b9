"""Fused BN+ReLU+maxpool epilogue for the ResNet stem (TPU serving).

Why: the stem is the most memory-bound piece of the slice-branch FEs. At
the flagship design point (4096 slices of 160x160 grayscale) the XLA stem
spends ~17.5 ms against a ~9 ms traffic floor (bench_fe_stages.py): the
conv output (4096x80x80x64, ~3.4 GB bf16) round-trips HBM twice more
through the separate BN/ReLU and max-pool ops. This kernel fuses
BatchNorm(eval) + ReLU + maxpool3x3/2 (torch padding=1 semantics) into
ONE pass over the conv output: read once, write the 4x-smaller pooled
map.

Layout-natural by construction: channels stay in lanes, H/W shifts are
sublane shifts / lane rotations — no transposes, no matmul, so Mosaic
lowers it without relayouts. (A fully-fused conv+BN+ReLU+pool kernel was
tried first and lost 8.6x: the space-to-depth patch assembly forced
4-lane masked stores and vreg relayouts that dwarfed the saved traffic —
negative result kept in scripts/exp_fused_stem.py history, BENCH_NOTES.)

Eval-only (no VJP; training keeps the XLA ops). Replaces the
bn1/relu/maxpool stem block of the reference's per-slice CNNs
(koafusion/models/_torchvision.py:141-246).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_pool_kernel(y_ref, a_ref, b_ref, o_ref):
    """y (bn, h, w, c) conv output; a/b (1, c) folded BN affine;
    o (bn, ho, wo, c) pooled output (ho = floor((h-1)/2)+1, likewise wo).
    """
    y = y_ref[...].astype(jnp.float32)
    y = jnp.maximum(y * a_ref[...] + b_ref[...], 0.0)

    # maxpool 3x3 stride 2, torch padding=1: out[i] = max over rows
    # {2i-1, 2i, 2i+1}. Post-ReLU activations are >= 0, so 0-padding is
    # equivalent to -inf padding. Shifted maxima give the running
    # 3-neighborhood max at every position; even positions are kept via a
    # reshape (avoids strided VMEM slicing).
    def pool_axis(t, axis):
        n = t.shape[axis]
        pad = [(0, 0)] * t.ndim
        pad[axis] = (1, 1 + n % 2)  # pad odd n to even for the subsample
        tp = jnp.pad(t, pad)
        lo = jax.lax.slice_in_dim(tp, 0, n, axis=axis)
        mid = jax.lax.slice_in_dim(tp, 1, n + 1, axis=axis)
        hi = jax.lax.slice_in_dim(tp, 2, n + 2, axis=axis)
        m = jnp.maximum(jnp.maximum(lo, mid), hi)
        if n % 2:
            m = jnp.pad(m, [(0, 0)] * axis + [(0, 1)]
                        + [(0, 0)] * (t.ndim - axis - 1))
        shape = list(m.shape)
        shape[axis] = (n + 1) // 2
        shape.insert(axis + 1, 2)
        return jax.lax.index_in_dim(m.reshape(shape), 0, axis=axis + 1,
                                    keepdims=False)

    y = pool_axis(pool_axis(y, 1), 2)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_bn_relu_pool(y, bn_scale, bn_bias, bn_mean, bn_var,
                       *, eps: float = 1e-5, block_n: int = 8,
                       interpret: bool = False):
    """BatchNorm(eval) + ReLU + maxpool3x3/2(pad 1) in one HBM pass.

    y: (N, H, W, C) conv output -> (N, floor((H-1)/2)+1,
    floor((W-1)/2)+1, C). bn_*: (C,) BatchNorm eval parameters. Output
    dtype follows y.
    """
    n, h, w, c = y.shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1

    a = (bn_scale / jnp.sqrt(bn_var + eps)).astype(jnp.float32)
    b = (bn_bias - bn_mean * a).astype(jnp.float32)

    # cap the block so the f32 working set (with 128-lane padding) stays
    # well under VMEM: ~4 live copies of the block during pooling
    per_slice = h * w * max(c, 128) * 4
    while block_n > 1 and block_n * per_slice > 24 * 1024 * 1024:
        block_n //= 2
    while n % block_n:
        block_n //= 2
    grid = (n // block_n,)

    return pl.pallas_call(
        _bn_pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, ho, wo, c),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), y.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y, a.reshape(1, c), b.reshape(1, c))
