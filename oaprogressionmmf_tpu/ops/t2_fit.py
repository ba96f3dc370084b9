"""T2 relaxation-map fitting: closed-form log-linear LSQ, fully on device.

The reference fits a mono-exponential decay y = A·exp(B·x) per pixel with a
Numba prange kernel (koafusion/datasets/_mr_t2_mapping.py:5-68). The math is
a weighted 2x2 linear solve per pixel — pure elementwise arithmetic over the
echo axis — so the TPU-native form is one fused XLA kernel over the whole
volume (vectorized sums over the echo dimension; no Python/pixel loops).

Semantics preserved exactly: weights y, log-weighted sums, NaN propagation
(a zero echo sample makes the pixel NaN → output 0), T2 = -1/B clamped to
[val_low, val_high] else 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fit_exp_linear(xs: jnp.ndarray, ys: jnp.ndarray):
    """Least-squares fit of y = A·exp(B·x) via the log-linear normal
    equations (Wolfram "LeastSquaresFittingExponential", weighted by y).

    xs, ys: (..., E). Returns (A, B) with NaN where the system is singular.
    """
    xs = xs.astype(jnp.float64) if xs.dtype == jnp.float64 else xs.astype(jnp.float32)
    ys = ys.astype(xs.dtype)
    lny = jnp.log(ys)
    S_x2_y = jnp.sum(xs * xs * ys, axis=-1)
    S_y_lny = jnp.sum(ys * lny, axis=-1)
    S_x_y = jnp.sum(xs * ys, axis=-1)
    S_x_y_lny = jnp.sum(xs * ys * lny, axis=-1)
    S_y = jnp.sum(ys, axis=-1)

    denom = S_y * S_x2_y - S_x_y * S_x_y
    a = (S_x2_y * S_y_lny - S_x_y * S_x_y_lny) / denom
    b = (S_y * S_x_y_lny - S_x_y * S_y_lny) / denom
    singular = denom == 0.0
    nan = jnp.full_like(a, jnp.nan)
    return (jnp.where(singular, nan, jnp.exp(a)),
            jnp.where(singular, nan, b))


@functools.partial(jax.jit, static_argnames=("nan_to", "val_low", "val_high"))
def _fit_t2_map_jit(vol, tes, nan_to=0.0, val_low=0.0, val_high=0.1):
    # vol: (S, R, C, E); tes: (S, E) → broadcast over pixels
    a, b = fit_exp_linear(tes[:, None, None, :], vol)
    t = -1.0 / b
    bad = jnp.isnan(a) | jnp.isnan(b)
    t = jnp.where(jnp.isnan(t), nan_to, t)
    t = jnp.where((t < val_low) | (t > val_high), 0.0, t)
    return jnp.where(bad, 0.0, t)


def fit_t2_map(vol, tes, nan_to=0.0, val_low=0.0, val_high=0.1):
    """(slices, rows, cols, echoes) MESE volume + (slices, echoes) TEs →
    (slices, rows, cols) T2 map. Reference-parity clamping semantics."""
    vol = jnp.asarray(np.asarray(vol), jnp.float32)
    tes = jnp.asarray(np.asarray(tes), jnp.float32)
    return np.asarray(
        _fit_t2_map_jit(vol, tes, nan_to=nan_to, val_low=val_low,
                        val_high=val_high))
