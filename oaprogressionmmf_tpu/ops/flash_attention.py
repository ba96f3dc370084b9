"""Fused multi-head attention for the FeaT aggregator.

The reference computes attention naively — materializing the (B, H, N, N)
score tensor (koafusion/models/_core_trf.py:156-182). Token counts in this
domain reach ~2.4k (with_gap=false, cf. SURVEY.md §5.7), where the
materialized attention matrix is HBM-bandwidth-hostile; the TPU-native form
is a blockwise online-softmax (flash) kernel in Pallas that keeps running
max/sum statistics in VMEM and never writes scores to HBM.

Two paths:
  * :func:`flash_attention` — Pallas forward kernel (custom VJP; backward
    recomputes scores with XLA einsums, which fuse well at these sizes),
  * :func:`attention_reference` — plain XLA attention that also returns the
    attention maps, used for explainability parity and as the CPU/test oracle.

Parity quirk preserved: the reference scales scores by ``emb_dim ** -0.5``
(full model width, not head width — `_core_trf.py:160`); callers pass that
scale explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale):
    """(B, H, N, D) q/k/v → (out, attn). XLA path, returns attention maps."""
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    attn = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     precision=jax.lax.Precision.HIGHEST)
    return out, attn


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                      scale: float, n_valid: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # HIGHEST only matters (and is only supported) for f32 operands; bf16
    # inputs already use the MXU's native bf16xbf16→f32 path.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < n_valid, s, -jnp.inf)

    m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)
    l_prev = jnp.max(l_ref[:], axis=1, keepdims=True)

    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = corr * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if v.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    B, H, N, D = q.shape
    qf = _pad_to(_pad_to(q.reshape(B * H, N, D), 1, block_q), 2, 128)
    kf = _pad_to(_pad_to(k.reshape(B * H, N, D), 1, block_k), 2, 128)
    vf = _pad_to(_pad_to(v.reshape(B * H, N, D), 1, block_k), 2, 128)
    BH, Nq, Dp = qf.shape
    Nk = kf.shape[1]

    grid = (BH, Nq // block_q, Nk // block_k)
    kernel = functools.partial(_flash_fwd_kernel, scale=scale, n_valid=N,
                               block_k=block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Nq, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N, :D].reshape(B, H, N, D)


# ---------------------------------------------------------------------------
# Public op with custom VJP (backward = recompute with XLA einsums)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, scale, block_q, block_k, interpret)


def _fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    out = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _bwd_rule(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhij,bhid->bhjd", p, g32,
                    precision=jax.lax.Precision.HIGHEST)
    dp = jnp.einsum("bhid,bhjd->bhij", g32, v.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bhjd->bhid", ds, k.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST) * scale
    dk = jnp.einsum("bhij,bhid->bhjd", ds, q.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention.defvjp(_fwd_rule, _bwd_rule)


def flash_attention(q, k, v, scale=None, block_q=128, block_k=128,
                    interpret=None):
    """Fused attention: (B, H, N, D) → (B, H, N, D), no materialized scores.

    ``interpret=None`` auto-selects Pallas interpret mode off-TPU so the same
    code path runs in CPU tests (SURVEY.md §7.4).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    import os
    if os.environ.get("OAPROG_FORCE_XLA_ATTENTION"):
        # escape hatch for hosts where Pallas interpret mode is too slow
        # (e.g. single-core multi-virtual-device dry runs): same math, plain
        # XLA, no score materialization concerns at dry-run sizes
        return attention_reference(q, k, v, scale)[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, float(scale), int(block_q), int(block_k),
                            bool(interpret))
