"""In-plane rotation augmentation with torch affine_grid/grid_sample parity.

Reproduces `PTRotate2D` / `PTRotate3DInSlice` (koafusion/preproc/_pt.py:
257-360): rotation about the image centre through a normalized affine grid
(align_corners=False), bilinear resampling with zero padding outside.

The rotation angle is a traced value (random per sample), so the resampling
cannot be folded into static matrices; it is expressed as four gathers +
a lerp, which XLA vectorizes on the VPU. Gradients flow through the weights
(not the integer indices), which is the standard STN formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_sample_bilinear_2d(img: jnp.ndarray, gx: jnp.ndarray,
                             gy: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) image at normalized grid coords, zero padding.

    gx/gy are (H_out, W_out) in [-1, 1]; unnormalization follows torch
    align_corners=False: ix = ((gx + 1) * W - 1) / 2.
    """
    H, W = img.shape
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yy, xx):
        valid = ((xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1))
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        return jnp.where(valid, img[yc, xc], 0.0)

    out = (gather(iy0, ix0) * wy0 * wx0 +
           gather(iy0, ix1) * wy0 * wx1 +
           gather(iy1, ix0) * wy1 * wx0 +
           gather(iy1, ix1) * wy1 * wx1)
    return out


def _rotation_grid(theta: jnp.ndarray, H: int, W: int):
    """Normalized output-pixel coords rotated by theta (torch convention)."""
    # align_corners=False normalized centers
    xs = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
    xn, yn = jnp.meshgrid(xs, ys)  # (H, W)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # theta matrix [[cos, -sin, 0], [sin, cos, 0]] applied to (x, y, 1)
    gx = cos * xn - sin * yn
    gy = sin * xn + cos * yn
    return gx, gy


def rotate2d(image: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate (CH, R, C) image by theta radians about its centre."""
    ch, H, W = image.shape
    gx, gy = _rotation_grid(theta, H, W)
    return jax.vmap(lambda im: _grid_sample_bilinear_2d(im, gx, gy))(image)


def rotate3d_in_slice(volume: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate every (R, C) slice of a (CH, R, C, S) volume by one shared theta.

    Matches PTRotate3DInSlice: a single angle applied per-slice in the
    row-column plane (koafusion/preproc/_pt.py:283-293).

    TPU formulation: the 4 bilinear taps share their (row, col) indices
    across the untouched slice axis, so instead of per-slice scalar
    gathers (VPU-serial, dominated the full-res augment at ~585 ms/batch)
    each tap is ONE row-gather of S-wide lanes from a (R*C, S) view —
    S=128 for DESS is exactly the lane width. Identical indices, weights,
    tap-sum order, and zero-padding semantics as the per-slice form (the
    weight product wy*wx is pre-folded — ≤1 ulp reassociation).
    """
    ch, H, W, S = volume.shape
    gx, gy = _rotation_grid(theta, H, W)
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    taps = []
    for yy, xx, wy, wx in (
            (iy0, ix0, 1.0, 1.0), (iy0, ix0 + 1.0, 1.0, 0.0),
            (iy0 + 1.0, ix0, 0.0, 1.0), (iy0 + 1.0, ix0 + 1.0, 0.0, 0.0)):
        valid = ((xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1))
        wx_t = (1.0 - (ix - ix0)) if wx else (ix - ix0)
        wy_t = (1.0 - (iy - iy0)) if wy else (iy - iy0)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        flat = (yc * W + xc).reshape(-1)
        # invalid taps are ZEROED on the gathered values (not via a zero
        # weight): 0·NaN would leak NaN through border taps otherwise
        taps.append((flat, valid.reshape(-1, 1),
                     (wy_t * wx_t).reshape(-1, 1)))

    # narrow slice axes (e.g. the 25-slice T2 stack) under-fill the
    # 128-lane vector and fall off the fast row-gather path (measured
    # 136 ms vs 26 ms for S=128 at the SAME row count; padding to 64
    # lanes did not help — the fast path wants a full 128-lane vreg row)
    # — lane-pad the gathered view to 128 and slice back after
    def one_channel(img3d):
        v = img3d.reshape(H * W, S)
        rows = [jnp.where(valid, jnp.take(v, flat, axis=0), 0.0) * w
                for flat, valid, w in taps]
        # same tap-sum order as _grid_sample_bilinear_2d: y0x0+y0x1+y1x0+y1x1
        out = rows[0] + rows[1] + rows[2] + rows[3]
        return out.reshape(H, W, S)

    if S < 128:
        pad = -S % 128

        def one_channel(img3d):  # noqa: F811 — lane-padded variant
            v = jnp.pad(img3d, ((0, 0), (0, 0), (0, pad))).reshape(
                H * W, S + pad)
            # the barrier matters: left fusable, XLA folds the pad into
            # the gather operand and emits the scalar-gather path anyway
            # (measured 142 ms); materialized, the row-gather fast path
            # kicks in (36.7 ms for the batch-16 T2 stack)
            v = jax.lax.optimization_barrier(v)
            rows = [jnp.where(valid, jnp.take(v, flat, axis=0), 0.0) * w
                    for flat, valid, w in taps]
            out = rows[0] + rows[1] + rows[2] + rows[3]
            return out.reshape(H, W, S + pad)[..., :S]

    return jax.vmap(one_channel)(volume)


# ---------------------------------------------------------------------------
# Affine-folded rotation (training augment fast path)
# ---------------------------------------------------------------------------

def _rotation_taps(theta, H: int, W: int):
    """The 4 bilinear taps of the rotation resample plus the valid-weight
    mask M = rotate(ones) — each tap is (flat_idx, valid, weight) of shape
    (H*W, 1). Identical indices/weights/tap order as rotate3d_in_slice."""
    gx, gy = _rotation_grid(theta, H, W)
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    taps = []
    for yy, xx, wy, wx in (
            (iy0, ix0, 1.0, 1.0), (iy0, ix0 + 1.0, 1.0, 0.0),
            (iy0 + 1.0, ix0, 0.0, 1.0), (iy0 + 1.0, ix0 + 1.0, 0.0, 0.0)):
        valid = ((xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1))
        wx_t = (1.0 - (ix - ix0)) if wx else (ix - ix0)
        wy_t = (1.0 - (iy - iy0)) if wy else (iy - iy0)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        flat = (yc * W + xc).reshape(-1)
        taps.append((flat, valid.reshape(-1, 1),
                     (wy_t * wx_t).reshape(-1, 1)))
    mask = sum(jnp.where(valid, w, 0.0) for _, valid, w in taps)  # (H*W, 1)
    return taps, mask


def rotate3d_in_slice_affine(volume, theta, scale, bias,
                             dtype=jnp.float32):
    """``scale * rotate3d_in_slice(volume) + bias * M`` in one pass.

    Folds the surrounding affines (unit-range before the rotation,
    normalization after) into the rotation epilogue: by linearity of the
    bilinear taps, rotate(a*x + b) == a*rotate(x) + b*M where
    M = rotate(ones) is the per-pixel sum of VALID tap weights (shared
    across the slice axis), so the zero-padding border semantics are
    preserved exactly. Saves the two full-volume passes that materialized
    unit(x) and the normalized output. `dtype=bfloat16` additionally
    halves the gather traffic (fast-augment mode; ~1e-3 value error).
    """
    ch, H, W, S = volume.shape
    taps, mask = _rotation_taps(theta, H, W)
    taps = [(flat, valid, w.astype(dtype)) for flat, valid, w in taps]
    scale = jnp.asarray(scale, dtype)
    bias_m = (jnp.asarray(bias, jnp.float32)
              * mask).astype(dtype).reshape(H, W, 1)
    pad = -S % 128 if S < 128 else 0

    def one_channel(img3d):
        v = img3d.astype(dtype)
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
        v = v.reshape(H * W, S + pad)
        if pad:
            # materialize the padded view: left fusable, XLA folds the pad
            # into the gather operand and emits the slow scalar-gather path
            # (see rotate3d_in_slice)
            v = jax.lax.optimization_barrier(v)
        rows = [jnp.where(valid, jnp.take(v, flat, axis=0),
                          jnp.asarray(0.0, dtype)) * w
                for flat, valid, w in taps]
        out = rows[0] + rows[1] + rows[2] + rows[3]
        out = out.reshape(H, W, S + pad)
        if pad:
            out = out[..., :S]
        return scale * out + bias_m

    return jax.vmap(one_channel)(volume)


def rotate2d_affine(image, theta, scale, bias, dtype=jnp.float32):
    """``scale * rotate2d(image) + bias * M`` in one pass (see
    rotate3d_in_slice_affine)."""
    ch, H, W = image.shape
    taps, mask = _rotation_taps(theta, H, W)
    scale = jnp.asarray(scale, dtype)
    bias_m = (jnp.asarray(bias, jnp.float32) * mask).astype(dtype)

    def one_channel(img):
        v = img.astype(dtype).reshape(H * W)
        rows = [jnp.where(valid[:, 0], jnp.take(v, flat),
                          jnp.asarray(0.0, dtype)) * w[:, 0].astype(dtype)
                for flat, valid, w in taps]
        out = rows[0] + rows[1] + rows[2] + rows[3]
        return (scale * out + bias_m[:, 0]).reshape(H, W)

    return jax.vmap(one_channel)(image)


# ---------------------------------------------------------------------------
# 3-shear matmul rotation (fast-augment alternative, MXU-resident)
# ---------------------------------------------------------------------------

def _shear_band(offsets, size_in: int, size_out: int, dtype):
    """(N, size_out, size_in) banded bilinear shift matrices: row o of
    matrix n samples position o + offsets[n] (zero outside)."""
    src = jnp.arange(size_out, dtype=jnp.float32)[None, :] + offsets[:, None]
    i0 = jnp.floor(src)
    w1 = src - i0                                   # (N, out)
    cols = jnp.arange(size_in, dtype=jnp.float32)[None, None, :]
    m = (jnp.where(cols == i0[..., None], (1.0 - w1)[..., None], 0.0)
         + jnp.where(cols == i0[..., None] + 1.0, w1[..., None], 0.0))
    return m.astype(dtype)


def rotate3d_in_slice_shear(volume, theta, dtype=jnp.bfloat16):
    """In-slice rotation as three 1-D shears, each a batched banded matmul.

    rot(θ) = shear_x(-tan(θ/2)) · shear_y(sin θ) · shear_x(-tan(θ/2))
    about the image centre. Each shear is a per-row (or per-column) 1-D
    bilinear shift, expressed as an (out, in) banded matrix batched over
    the orthogonal axis — 3 MXU dot_generals instead of 4 VPU row-gathers.

    NOT the same interpolation as the bilinear grid_sample (three chained
    1-D lerps vs one 2-D lerp): same rotation, slightly different
    filtering — an augmentation-distribution equivalence, not sample
    parity, so this is an OPT-IN for the non-parity fast-augment regime
    (training.shear_rotation / OAPROG_SHEAR_ROT=1). Border handling is
    zero-fill like the grid-sample form (values sheared from outside
    vanish; a fully-inside pixel matches the grid-sample rotation to
    within the filtering difference).
    """
    ch, H, W, S = volume.shape
    t = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    # centre offsets in pixel units (centre = (n-1)/2)
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0

    mx = _shear_band(t * ys, W, W, dtype)       # (H, W, W) row-wise x-shear
    my = _shear_band(s * xs, H, H, dtype)       # (W, H, H) col-wise y-shear

    def one_channel(v):                          # (H, W, S)
        v = v.astype(dtype)
        # shear_x: out[h, o, s] = sum_i mx[h, o, i] * v[h, i, s]
        v = jax.lax.dot_general(mx, v, (((2,), (1,)), ((0,), (0,))))
        # shear_y over rows: batch over w — transpose to (W, H, S)
        v = jnp.transpose(v, (1, 0, 2))
        v = jax.lax.dot_general(my, v, (((2,), (1,)), ((0,), (0,))))
        v = jnp.transpose(v, (1, 0, 2))
        v = jax.lax.dot_general(mx, v, (((2,), (1,)), ((0,), (0,))))
        return v

    return jax.vmap(one_channel)(volume)


def rotate3d_in_slice_shear_affine(volume, theta, scale, bias,
                                   dtype=jnp.bfloat16):
    """``scale * rotate3d_in_slice_shear(v) + bias * M`` with M the shear
    image of a ones-slice (zero-fill borders; see the affine folding note
    in rotate3d_in_slice_affine)."""
    ch, H, W, S = volume.shape
    rot = rotate3d_in_slice_shear(volume, theta, dtype=dtype)
    ones = jnp.ones((1, H, W, 1), jnp.float32)
    mask = rotate3d_in_slice_shear(ones, theta, dtype=dtype)[0, ..., 0]
    return (jnp.asarray(scale, dtype) * rot
            + (jnp.asarray(bias, jnp.float32)
               * mask.astype(jnp.float32)).astype(dtype)[..., None])
