"""Fused multi-head attention for the FeaT aggregator.

The reference computes attention naively — materializing the (B, H, N, N)
score tensor (koafusion/models/_core_trf.py:156-182). Token counts in this
domain reach ~2.4k (with_gap=false, cf. SURVEY.md §5.7), where the
materialized attention matrix is HBM-bandwidth-hostile; the TPU-native form
is a blockwise online-softmax (flash) kernel in Pallas that keeps running
max/sum statistics in VMEM and never writes scores to HBM.

Two paths:
  * :func:`flash_attention` — Pallas forward kernel emitting per-row
    logsumexp, with a custom VJP whose backward is also Pallas flash
    kernels (dq and dk/dv passes recompute P blockwise from the lse; the
    (N, N) score/probability matrices never touch HBM in either direction),
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


def attention_reference(q, k, v, scale, pair_mask=None):
    """(B, H, N, D) q/k/v → (out, attn). XLA path, returns attention maps.

    ``pair_mask``: optional (B, N, N) boolean; False positions are
    excluded (score −inf), matching the reference's ``masked_fill_``
    (koafusion/models/_core_trf.py:172-177)."""
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if pair_mask is not None:
        s = jnp.where(pair_mask[:, None, :, :], s, -jnp.inf)
    attn = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     precision=jax.lax.Precision.HIGHEST)
    return out, attn


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                      l_ref, *, scale: float, n_valid: int, block_k: int):
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
        # logsumexp per q row — the backward's softmax-recompute statistic
        # (broadcast across the 128-lane minor dim: TPU block tiling
        # requires the last two block dims be (8k, 128)-aligned)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, :1] + jnp.log(l_ref[:, :1]), lse_ref.shape[1:])


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
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((BH, Nq, Dp), q.dtype),
                   jax.ShapeDtypeStruct((BH, Nq, 128), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N, :D].reshape(B, H, N, D), lse


# ---------------------------------------------------------------------------
# Pallas backward kernels (flash backward: recompute P blockwise from lse)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                         dq_ref, acc_ref, *, scale: float, n_valid: int,
                         block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < n_valid, s, -jnp.inf)
    p = jnp.exp(s - lse_ref[0][:, :1])                    # (bq, bk)

    # delta_i = sum_d dO_i O_i, recomputed per block (VPU-cheap)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=1, keepdims=True)
    dp = jax.lax.dot_general(g.astype(jnp.float32), v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    ds = p * (dp - delta)
    acc_ref[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec) * scale

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                          n_valid: int, block_k: int):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    kj = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    kpos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < n_valid, s, -jnp.inf)
    p = jnp.exp(s - lse_ref[0][:, :1])                    # (bq, bk)

    dv_acc[:] += jax.lax.dot_general(
        p, g.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=1, keepdims=True)
    dp = jax.lax.dot_general(g.astype(jnp.float32), v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    ds = p * (dp - delta)
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec) * scale

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, out, lse, g, scale, block_q, block_k, interpret):
    B, H, N, D = q.shape
    qf = _pad_to(_pad_to(q.reshape(B * H, N, D), 1, block_q), 2, 128)
    kf = _pad_to(_pad_to(k.reshape(B * H, N, D), 1, block_k), 2, 128)
    vf = _pad_to(_pad_to(v.reshape(B * H, N, D), 1, block_k), 2, 128)
    gf = _pad_to(_pad_to(g.reshape(B * H, N, D), 1, block_q), 2, 128)
    of = _pad_to(_pad_to(out.reshape(B * H, N, D), 1, block_q), 2, 128)
    # lse is (BH, Nq_padded, 128) straight from the forward. Padded q rows
    # are harmless in the backward: their g/out rows are zero, so delta=0,
    # ds·(from dp=0)=..., and every contribution they make to dk/dv/dq is
    # exactly zero.
    lse_f = lse
    BH, Nq, Dp = qf.shape
    Nk = kf.shape[1]

    qspec = pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0))
    lspec = pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, n_valid=N,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, Dp), q.dtype),
        grid=(BH, Nq // block_q, Nk // block_k),
        in_specs=[qspec, kspec, kspec, qspec, qspec, lspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_q, Dp), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, gf, of, lse_f)

    # dkv grid: k-block outer, q-blocks inner — index maps see (b, j, i)
    qspec_t = pl.BlockSpec((1, block_q, Dp), lambda b, j, i: (b, i, 0))
    kspec_t = pl.BlockSpec((1, block_k, Dp), lambda b, j, i: (b, j, 0))
    lspec_t = pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_valid=N,
                          block_k=block_k),
        out_shape=(jax.ShapeDtypeStruct((BH, Nk, Dp), k.dtype),
                   jax.ShapeDtypeStruct((BH, Nk, Dp), v.dtype)),
        grid=(BH, Nk // block_k, Nq // block_q),
        in_specs=[qspec_t, kspec_t, kspec_t, qspec_t, qspec_t, lspec_t],
        out_specs=(kspec_t, kspec_t),
        scratch_shapes=[pltpu.VMEM((block_k, Dp), jnp.float32),
                        pltpu.VMEM((block_k, Dp), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, gf, of, lse_f)

    dq = dq[:, :N, :D].reshape(B, H, N, D)
    dk = dk[:, :N, :D].reshape(B, H, N, D)
    dv = dv[:, :N, :D].reshape(B, H, N, D)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public op with custom VJP (backward = Pallas flash kernels)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, scale, block_q, block_k, interpret)[0]


def _fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _bwd_rule(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, g, scale, block_q, block_k,
                            interpret)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention.defvjp(_fwd_rule, _bwd_rule)


def _pick_block(n: int) -> int:
    """Largest of {512, 256, 128} whose padding waste on n stays ≤15%.

    Measured on v5e at the design point (N=2432, D=256, bf16): fwd+bwd
    7.2 ms at block 512 vs 15.0 ms at block 128 — bigger blocks amortize
    the per-block loop and keep the MXU fed; the waste cap protects short
    sequences (N=91 gap-mode tokens stay at 128)."""
    for b in (512, 256, 128):
        if ((-n) % b) / n <= 0.15:
            return b
    return 128


def flash_attention(q, k, v, scale=None, block_q=None, block_k=None,
                    interpret=None):
    """Fused attention: (B, H, N, D) → (B, H, N, D), no materialized scores.

    ``interpret=None`` auto-selects Pallas interpret mode off-TPU so the same
    code path runs in CPU tests (SURVEY.md §7.4). ``block_q``/``block_k``
    default to an N-adaptive size (see :func:`_pick_block`).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if block_q is None:
        block_q = _pick_block(q.shape[2])
    if block_k is None:
        block_k = _pick_block(k.shape[2])
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
