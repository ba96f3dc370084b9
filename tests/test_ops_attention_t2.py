import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oaprogressionmmf_tpu.ops import (
    attention_reference, fit_exp_linear, fit_t2_map, flash_attention)


# ---------------------------------------------------------------------------
# flash attention (interpret mode on CPU) vs XLA reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b,h,n,d", [
    (2, 2, 64, 128),     # n < block
    (1, 1, 200, 64),     # ragged n, d < 128
])
def test_flash_matches_reference(b, h, n, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    scale = (h * d) ** -0.5  # reference-style full-width scale
    want, _ = attention_reference(q, k, v, scale)
    got = flash_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match_reference():
    rng = np.random.RandomState(1)
    b, h, n, d = 1, 2, 96, 64
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale)[0] ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


@pytest.mark.parametrize("dtype,atol", [(np.float32, 5e-4), ("bf16", 4e-2)])
def test_flash_gradients_multiblock(dtype, atol):
    """Cross-block accumulation paths: n=200 with 128-blocks exercises dq
    accumulation over 2 k-blocks and dk/dv over 2 q-blocks (incl. a ragged
    final block) — the production N=2432/block-512 layout in miniature."""
    rng = np.random.RandomState(4)
    b, h, n, d = 1, 1, 200, 64
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    q = jnp.asarray(rng.randn(b, h, n, d), jdt)
    k = jnp.asarray(rng.randn(b, h, n, d), jdt)
    v = jnp.asarray(rng.randn(b, h, n, d), jdt)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale)[0]
                       .astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32), atol=atol)


def test_flash_bf16():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 64, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 64, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 64, 128), jnp.bfloat16)
    want, _ = attention_reference(q, k, v, 0.1)
    got = flash_attention(q, k, v, scale=0.1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)


def test_attention_maps_are_probabilities():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 10, 16).astype(np.float32))
    _, attn = attention_reference(q, q, q, 0.25)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# T2 map fitting (closed-form log-linear) vs synthetic ground truth
# ---------------------------------------------------------------------------

def test_fit_exp_linear_recovers_clean_decay():
    xs = jnp.asarray([0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07])
    A, T2 = 1000.0, 0.045
    ys = A * jnp.exp(-xs / T2)
    a, b = fit_exp_linear(xs, ys)
    np.testing.assert_allclose(float(a), A, rtol=1e-3)
    np.testing.assert_allclose(-1.0 / float(b), T2, rtol=1e-3)


def test_fit_t2_map_volume():
    rng = np.random.RandomState(4)
    S, R, C, E = 3, 8, 8, 7
    tes = np.tile(np.linspace(0.01, 0.07, E), (S, 1))
    t2_true = rng.uniform(0.02, 0.08, size=(S, R, C))
    amp = rng.uniform(500, 1500, size=(S, R, C))
    vol = amp[..., None] * np.exp(-tes[:, None, None, :] / t2_true[..., None])
    out = fit_t2_map(vol, tes)
    np.testing.assert_allclose(out, t2_true, rtol=5e-3)


def test_fit_t2_map_clamps_out_of_range():
    S, R, C, E = 1, 2, 2, 5
    tes = np.tile(np.linspace(0.01, 0.05, E), (S, 1))
    # very long T2 (0.5 s) > val_high=0.1 -> clamped to 0
    vol = 100 * np.exp(-tes[:, None, None, :] / 0.5) * np.ones((S, R, C, E))[..., :]
    out = fit_t2_map(vol, tes)
    np.testing.assert_array_equal(out, np.zeros((S, R, C)))


def test_fit_t2_map_zero_signal_pixel_is_zero():
    S, R, C, E = 1, 2, 2, 5
    tes = np.tile(np.linspace(0.01, 0.05, E), (S, 1))
    vol = np.zeros((S, R, C, E))
    vol[0, 0, 0] = 100 * np.exp(-tes[0] / 0.04)  # one good pixel
    out = fit_t2_map(vol, tes)
    np.testing.assert_allclose(out[0, 0, 0], 0.04, rtol=1e-3)
    assert out[0, 1, 1] == 0.0  # all-zero signal -> singular/NaN -> 0
