"""Golden-value parity tests of device preprocessing vs torch CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from oaprogressionmmf_tpu.ops import (
    interpolate, rotate2d, rotate3d_in_slice, to_unit_range, normalize,
    gamma_correction, center_crop_np, random_crop_np,
)


# ---------------------------------------------------------------------------
# interpolate ↔ torch.nn.functional.interpolate parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,factor,mode", [
    ((2, 1, 21), (0.5,), "linear"),
    ((1, 1, 35, 35), (0.5, 0.5), "bilinear"),
    ((2, 1, 16, 16, 10), (0.5, 0.5, 1.0), "trilinear"),
    ((1, 1, 10, 10), (1.7, 1.3), "bilinear"),
])
def test_interpolate_matches_torch(shape, factor, mode):
    rng = np.random.RandomState(0)
    x = rng.rand(*shape).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), scale_factor=factor,
                          recompute_scale_factor=True, align_corners=False,
                          mode=mode).numpy()
    got = np.asarray(interpolate(jnp.asarray(x), factor))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_interpolate_fast_close_to_exact():
    """Serving-fast bf16 resize (ops/resize.py interpolate_fast): same
    shapes, bounded bf16 rounding vs the exact chain — on uint8-origin
    volumes the first dot is lossless, intermediate half-integers round to
    ~1e-2 of the 8-bit range worst case."""
    from oaprogressionmmf_tpu.ops.resize import interpolate_fast

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2, 1, 32, 32, 16)).astype(np.uint8)
    want = np.asarray(interpolate(jnp.asarray(x, jnp.float32),
                                  (0.5, 0.5, 0.5)))
    got = np.asarray(interpolate_fast(jnp.asarray(x), (0.5, 0.5, 0.5)))
    assert got.shape == want.shape
    assert got.dtype == np.float32
    # bounded relative-to-range error (bf16 carries round half-integers)
    np.testing.assert_allclose(got, want, atol=255 * 8e-3)

    x2 = rng.randint(0, 256, (2, 1, 16, 16)).astype(np.uint8)
    got2 = np.asarray(interpolate_fast(jnp.asarray(x2), (1.0, 0.5)))
    want2 = np.asarray(interpolate(jnp.asarray(x2, jnp.float32),
                                   (1.0, 0.5)))
    # one axis resized: a single bf16 round of the exact half-integers
    np.testing.assert_allclose(got2, want2, atol=0.5)


# ---------------------------------------------------------------------------
# rotation ↔ torch affine_grid/grid_sample parity
# ---------------------------------------------------------------------------

def _torch_rotate2d(x_np, theta):
    x = torch.from_numpy(x_np)[None]  # (1, CH, R, C)
    rot = torch.tensor([[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0]],
                       dtype=x.dtype)[None]
    grid = TF.affine_grid(rot, x.size(), align_corners=False)
    return TF.grid_sample(x, grid, align_corners=False)[0].numpy()


@pytest.mark.parametrize("theta_deg", [-15.0, 90.0])
def test_rotate2d_matches_torch(theta_deg):
    rng = np.random.RandomState(1)
    x = rng.rand(1, 33, 37).astype(np.float32)
    theta = np.deg2rad(theta_deg)
    want = _torch_rotate2d(x, theta)
    got = np.asarray(rotate2d(jnp.asarray(x), jnp.float32(theta)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate3d_in_slice_matches_torch():
    rng = np.random.RandomState(2)
    vol = rng.rand(1, 24, 24, 5).astype(np.float32)
    theta = np.deg2rad(-12.0)
    # torch path: (s, ch, r, c) batch rotation as in PTRotate3DInSlice
    x = torch.from_numpy(np.moveaxis(vol, -1, 0))  # (S, CH, R, C)
    rot = torch.tensor([[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0]],
                       dtype=x.dtype)[None].repeat(x.shape[0], 1, 1)
    grid = TF.affine_grid(rot, x.size(), align_corners=False)
    want = np.moveaxis(TF.grid_sample(x, grid, align_corners=False).numpy(),
                       0, -1)
    got = np.asarray(rotate3d_in_slice(jnp.asarray(vol), jnp.float32(theta)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate3d_wide_slice_axis_matches_per_slice():
    """S>=64 takes the unpadded row-gather path (S<64 is lane-padded —
    covered by the torch golden test above); both must equal per-slice
    rotate2d."""
    rng = np.random.RandomState(3)
    vol = rng.rand(1, 12, 12, 64).astype(np.float32)
    theta = jnp.float32(np.deg2rad(9.0))
    got = np.asarray(rotate3d_in_slice(jnp.asarray(vol), theta))
    per_slice = np.stack(
        [np.asarray(rotate2d(jnp.asarray(vol[..., s]), theta))
         for s in range(64)], axis=-1)
    np.testing.assert_allclose(got, per_slice, atol=1e-5)


# ---------------------------------------------------------------------------
# scalar transforms
# ---------------------------------------------------------------------------

def test_to_unit_range():
    x = jnp.asarray([[2.0, 4.0], [6.0, 10.0]])
    out = np.asarray(to_unit_range(x))
    assert out.min() == 0.0 and out.max() == 1.0
    np.testing.assert_allclose(out, (np.asarray(x) - 2) / 8)


def test_normalize_channelwise():
    x = jnp.ones((2, 3, 3))
    out = np.asarray(normalize(x, mean=[1.0, 0.5], std=[0.5, 0.25]))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 2.0)


def test_gamma_correction():
    x = jnp.asarray([0.25, 0.5, 1.0])
    out = np.asarray(gamma_correction(x, jnp.float32(2.0)))
    np.testing.assert_allclose(out, np.asarray(x) ** 0.5, atol=1e-5)


# ---------------------------------------------------------------------------
# host crops (reference-parity with preproc/_np_nd.py)
# ---------------------------------------------------------------------------

def test_random_crop_matches_reference_offsets():
    rng = np.random.RandomState(3)
    img = rng.rand(1, 10, 12)
    out = random_crop_np(img, (4, 6), ratios=(0.5, 0.999))
    # start = floor(0.5*(10-4)) = 3 ; floor(0.999*(12-6)) = 5
    np.testing.assert_array_equal(out, img[:, 3:7, 5:11])


def test_center_crop():
    rng = np.random.RandomState(4)
    img = rng.rand(1, 10, 13)
    out = center_crop_np(img, (4, 5))
    np.testing.assert_array_equal(out, img[:, 3:7, 4:9])


def test_crop_too_small_raises():
    img = np.zeros((1, 4, 4))
    with pytest.raises(ValueError):
        center_crop_np(img, (8, 8))
    with pytest.raises(ValueError):
        random_crop_np(img, (8, 8), ratios=(0.5, 0.5))


def test_augment_fn_deterministic_given_key():
    from oaprogressionmmf_tpu.ops import make_augment_fn
    aug = make_augment_fn("sag_3d_dess")
    rng = np.random.RandomState(5)
    vol = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    key = jax.random.key(0)
    a = np.asarray(aug(vol, key))
    b = np.asarray(aug(vol, key))
    np.testing.assert_array_equal(a, b)
    # at least one other key must produce a different augmentation
    diffs = [np.abs(a - np.asarray(aug(vol, jax.random.key(s)))).max()
             for s in range(1, 6)]
    assert max(diffs) > 0


def test_eval_preproc_is_unit_range_then_normalize():
    from oaprogressionmmf_tpu.ops import make_eval_preproc_fn
    fn = make_eval_preproc_fn("xr_pa")
    rng = np.random.RandomState(6)
    img = jnp.asarray((rng.rand(1, 8, 8) * 255).astype(np.float32))
    out = np.asarray(fn(img))
    x = np.asarray(img)
    expect = ((x - x.min()) / (x.max() - x.min()) - 0.543) / 0.296
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_percentile_clip_matches_numpy():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(40, 40).astype(np.float32) * 100)
    from oaprogressionmmf_tpu.ops import percentile_clip
    out = np.asarray(percentile_clip(x, 5.0, 95.0))
    lo, hi = np.percentile(np.asarray(x), [5.0, 95.0])
    np.testing.assert_allclose(out, np.clip(np.asarray(x), lo, hi), atol=1e-4)
    out_u = np.asarray(percentile_clip(x, 5.0, 95.0, to_unit_range=True))
    assert 0 <= out_u.min() and out_u.max() <= 1.0 + 1e-6


def test_denormalize_inverts_normalize():
    from oaprogressionmmf_tpu.ops import denormalize
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(1, 6, 6).astype(np.float32))
    y = normalize(x, [0.45], [0.29])
    back = np.asarray(denormalize(y, [0.45], [0.29]))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-6)


def test_reproject_moves_axes():
    from oaprogressionmmf_tpu.ops import reproject
    x = jnp.zeros((1, 4, 5, 6))
    assert reproject(x, [1, 3], [3, 1]).shape == (1, 6, 5, 4)


def test_random_flip_deterministic_and_valid():
    from oaprogressionmmf_tpu.ops import random_flip
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 6, 6).astype(np.float32))
    a = np.asarray(random_flip(x, jax.random.key(0)))
    b = np.asarray(random_flip(x, jax.random.key(0)))
    np.testing.assert_array_equal(a, b)
    # any output must be reachable by some axis-flip combination
    cands = [np.asarray(x)[:, ::sr, ::sc]
             for sr in (1, -1) for sc in (1, -1)]
    assert any(np.array_equal(a, c) for c in cands)


def test_fused_eval_preproc_matches_reference_order():
    """make_preprocess_fn(eval) reorders affine ops around the linear
    downscale; result must match unit-range→normalize→downscale exactly."""
    from oaprogressionmmf_tpu.ops import make_eval_preproc_fn
    from oaprogressionmmf_tpu.train.trainer import make_preprocess_fn

    rng = np.random.RandomState(11)
    x = (rng.rand(2, 1, 32, 32, 6) * 255).astype(np.uint8)
    downscale = [[0.5, 0.5, 0.5]]
    fused = make_preprocess_fn(["sag_3d_dess"], downscale, train=False)
    got = np.asarray(fused((jnp.asarray(x),))[0])

    ref_fn = make_eval_preproc_fn("sag_3d_dess")
    want = np.asarray(interpolate(
        jax.vmap(ref_fn)(jnp.asarray(x)), tuple(downscale[0])))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert got.shape == (2, 1, 16, 16, 3)


def test_halving_fast_path_matches_matrix_form():
    """The 0.5-downscale reduce_window fast path equals the general
    interpolation-matrix form (and hence torch bilinear with
    align_corners=False at exact halving) up to one-rounding f32
    reassociation."""
    from oaprogressionmmf_tpu.ops.resize import _interp_matrix, interpolate

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 1, 12, 10).astype(np.float32) * 255)
    got = interpolate(x, (0.5, 0.5))
    mat_r = np.asarray(_interp_matrix(12, 6))
    mat_c = np.asarray(_interp_matrix(10, 5))
    want = np.einsum("bcrw,or->bcow", np.asarray(x), mat_r)
    want = np.einsum("bcow,pw->bcop", want, mat_c)
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32),
                               rtol=1e-6)

    # volumes: (B, CH, R, C, S) with mixed factors
    v = jnp.asarray(rng.rand(1, 1, 8, 8, 6).astype(np.float32))
    out = interpolate(v, (0.5, 0.5, 1.0))
    assert out.shape == (1, 1, 4, 4, 6)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, :, :, 0],
        np.asarray(v)[0, 0].reshape(4, 2, 4, 2, 6).mean((1, 3))[:, :, 0],
        rtol=1e-6)


def test_rotate_affine_folding_matches_unfolded():
    """rotate*_affine(x, th, a, b) == a*rotate(unit-style affine) + b*M:
    the folded form used by make_augment_fn must equal applying the affine
    BEFORE the plain rotation (linearity of the bilinear taps; zero-pad
    borders produce a*0 + b*0 on both sides)."""
    from oaprogressionmmf_tpu.ops.rotate import (
        rotate2d, rotate2d_affine, rotate3d_in_slice,
        rotate3d_in_slice_affine)

    rng = np.random.RandomState(11)
    theta = jnp.float32(0.21)
    a, b = np.float32(0.37), np.float32(-0.12)

    vol = jnp.asarray(rng.rand(1, 12, 12, 5).astype(np.float32) * 3 + 1)
    want = np.asarray(rotate3d_in_slice(a * vol + b, theta))
    got = np.asarray(rotate3d_in_slice_affine(vol, theta, a, b))
    np.testing.assert_allclose(got, want, atol=2e-6)

    img = jnp.asarray(rng.rand(1, 13, 9).astype(np.float32) * 2 - 1)
    want2 = np.asarray(rotate2d(a * img + b, theta))
    got2 = np.asarray(rotate2d_affine(img, theta, a, b))
    np.testing.assert_allclose(got2, want2, atol=2e-6)


def test_augment_fn_folded_matches_reference_order():
    """make_augment_fn's folded single-pass form == the explicit reference
    composition ToUnitRange -> Rotate -> Gamma -> Normalize for the same
    sampled parameters (f32; fast=True stays within bf16 tolerance)."""
    from oaprogressionmmf_tpu.ops import make_augment_fn
    from oaprogressionmmf_tpu.ops.preproc import (MODALITY_STATS,
                                                  gamma_correction,
                                                  normalize, to_unit_range)
    from oaprogressionmmf_tpu.ops.rotate import rotate3d_in_slice

    rng = np.random.RandomState(12)
    vol = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32) * 7)
    key = jax.random.key(3)

    # reproduce the augment's own parameter draws
    k_rotp, k_theta, k_gp, k_gamma = jax.random.split(key, 4)
    theta = jax.random.uniform(
        k_theta, (), minval=np.deg2rad(-15.0), maxval=np.deg2rad(15.0))
    p_rot = float(jax.random.uniform(k_rotp, ()))
    gamma = jax.random.uniform(k_gamma, (), minval=0.5, maxval=2.0)
    p_g = float(jax.random.uniform(k_gp, ()))

    x = to_unit_range(vol)
    if p_rot < 0.5:
        x = rotate3d_in_slice(x, theta)
    if p_g < 0.5:
        x = gamma_correction(x, gamma)
    mean, std = MODALITY_STATS["sag_3d_dess"]
    want = np.asarray(normalize(x, [mean], [std]))

    got = np.asarray(make_augment_fn("sag_3d_dess")(vol, key), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4)

    got_fast = np.asarray(
        make_augment_fn("sag_3d_dess", fast=True)(vol, key), np.float32)
    # bf16 gathers + bf16 gamma pow: ~0.4% of the normalized range
    np.testing.assert_allclose(got_fast, want, atol=0.08)


def test_rotate3d_shear_matches_gather_interior():
    """3-shear matmul rotation tracks the bilinear grid-sample rotation on
    interior pixels (different 1-D filtering -> loose tolerance); borders
    zero-fill on both. Opt-in fast-augment path (OAPROG_SHEAR_ROT)."""
    from oaprogressionmmf_tpu.ops.rotate import (rotate3d_in_slice,
                                                 rotate3d_in_slice_shear)

    # smooth field: filtering differences vanish on smooth content
    # (measured: max 0.0098 interior; sharp edges differ by ~0.16 — the
    # two forms are distribution-equivalent, not sample-equivalent)
    H = W = 32
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (np.sin(xx * 0.35) * np.cos(yy * 0.22) * 0.5 + 0.5)
    vol = np.stack([img, img * 0.7 + 0.1], -1)[None].astype(np.float32)
    theta = jnp.float32(np.deg2rad(11.0))

    want = np.asarray(rotate3d_in_slice(jnp.asarray(vol), theta),
                      np.float32)
    got = np.asarray(rotate3d_in_slice_shear(jnp.asarray(vol), theta,
                                             dtype=jnp.float32), np.float32)
    inner = (slice(None), slice(8, 24), slice(8, 24), slice(None))
    err = np.abs(got[inner] - want[inner]).max()
    assert err < 0.02, err
    # rotation direction/centre agree: high correlation everywhere
    # (the OPPOSITE direction measures corr ~0.19)
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.99, c
