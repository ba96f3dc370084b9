"""Fold the eval downscale INTO the stem conv: half+conv7/s2 == conv14/s4.

The eval path downsamples (bilinear f=0.5 == adjacent-pair mean on even
extents) and then runs the 7x7/s2 stem — two full passes over the volume
plus a slice-fold transpose. Both ops are linear, so they compose exactly:

  y[o] = sum_a k7[a] * 0.5*(x[4o+2a-6] + x[4o+2a-7+1])
       = conv(x, k14, stride 4, pad (6,4)),  k14[2a+d] = 0.5*k7[a]

(per axis; 2D kernel = both axes composed -> 14x14, 0.25*k7). With the
host shipping the DESS volume S-major, the slice-pair mean keeps slices
adjacent to batch so the slice fold becomes a free reshape.

Cases (batch 64 flagship dess branch, to the stem output pre-BN):
  A_current      u8 (B,1,320,320,128) -> interpolate_fast -> transpose to
                 (B*64,160,160,1) -> conv7/s2 bf16
  B_folded       u8 S-major (B,128,320,320) -> pair-mean bf16 -> reshape
                 -> composed conv14/s4 bf16
  C_conv_only    composed conv alone on resident bf16 input
Numerics: B vs A mean rel err (bf16-scale expected).
Run on TPU: python scripts/exp_fold_stem2.py [batch]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.ops.resize import interpolate_fast

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = 8
    rng = np.random.RandomState(0)

    dess = (rng.rand(batch, 1, 320, 320, 128) * 255).astype(np.uint8)
    dess_smajor = np.ascontiguousarray(np.moveaxis(dess[:, 0], -1, 1))
    k7 = (rng.randn(7, 7, 1, 64).astype(np.float32) / 7.0)

    # composed 14x14 kernel: k14[2a+d, 2b+e] = 0.25 * k7[a, b]
    k14 = np.zeros((14, 14, 1, 64), np.float32)
    for d in range(2):
        for e in range(2):
            k14[d::2, e::2] = 0.25 * k7
    k7j = jnp.asarray(k7.astype(np.float32))
    k14j = jnp.asarray(k14.astype(np.float32))

    def conv(x, k, strides, padding):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def a_current(x, k):
        y = interpolate_fast(x, (0.5, 0.5, 0.5))      # (B,1,160,160,64)
        y = jnp.moveaxis(y[:, 0], -1, 1)              # (B,64,160,160)
        y = y.reshape(-1, 160, 160, 1)
        return conv(y, k, (2, 2), [(3, 3), (3, 3)])

    def b_folded(xs, k):
        # slice-pair mean on the s-major volume: (B,128,H,W)->(B,64,H,W)
        y = (xs[:, 0::2].astype(jnp.bfloat16)
             + xs[:, 1::2].astype(jnp.bfloat16)) * jnp.bfloat16(0.5)
        y = y.reshape(-1, 320, 320, 1)
        return conv(y, k, (4, 4), [(6, 4), (6, 4)])

    def c_conv_only(y, k):
        return conv(y, k, (4, 4), [(6, 4), (6, 4)])

    xj = jnp.asarray(dess)
    xsj = jnp.asarray(dess_smajor)

    a_out = np.asarray(jax.jit(a_current)(xj[:2], k7j), np.float32)
    b_out = np.asarray(jax.jit(b_folded)(xsj[:2], k14j),
                       np.float32)[: a_out.shape[0]]
    # b processes 2*64 slices; a too (batch var is closed over) — compare
    err = float(np.abs(a_out - b_out).mean()
                / (np.abs(a_out).mean() + 1e-6))
    print(json.dumps({"check": "B_vs_A_mean_rel_err", "err": round(err, 5)}),
          flush=True)

    y_resident = jnp.asarray(
        (dess_smajor[:, 0::2].astype(np.float32)
         + dess_smajor[:, 1::2]) * 0.5).astype(jnp.bfloat16).reshape(
        batch * 64, 320, 320, 1)

    def timed(tag, fn, x, k):
        @jax.jit
        def chain(x, k):
            def body(acc, i):
                xi = x + (i % 2).astype(x.dtype)
                return acc + jnp.sum(fn(xi, k).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc
        np.asarray(chain(x, k))
        t0 = time.perf_counter()
        np.asarray(chain(x, k))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)

    timed("A_current_downscale_fold_stem", a_current, xj, k7j)
    timed("B_folded_conv14s4", b_folded, xsj, k14j)
    timed("C_composed_conv_only", c_conv_only, y_resident, k14j)


if __name__ == "__main__":
    main()
