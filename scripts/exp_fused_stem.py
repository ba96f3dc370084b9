"""Fused stem epilogue (Pallas BN+ReLU+pool) vs the all-XLA stem.

XLA baseline (bench_fe_stages.py): stem prefix = 18.9 ms int8 / 17.5 ms
bf16 at 4096x160x160 — the conv output round-trips HBM through separate
BN/ReLU and pool ops. ops/fused_stem.py collapses the epilogue into one
pass.

History: a FULLY-fused conv+BN+ReLU+pool kernel (space-to-depth patch
matmul in-kernel) was tried first and measured 128 ms vs 14.9 — the
4-lane patch stores/relayouts dwarfed the saved traffic. The epilogue
fusion keeps channels in lanes throughout.

Run on TPU: python scripts/exp_fused_stem.py [slices] [block_n]
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
    import flax.linen as nn

    from oaprogressionmmf_tpu.ops.fused_stem import fused_bn_relu_pool

    slices = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = 8
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    kern = rng.randn(7, 7, 1, 64).astype(np.float32) * 0.1
    scale = np.abs(rng.randn(64).astype(np.float32)) + 0.5
    bias = rng.randn(64).astype(np.float32) * 0.1
    mean = rng.randn(64).astype(np.float32) * 0.1
    var = np.abs(rng.randn(64).astype(np.float32)) + 0.5

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def xla_stem(x, k, s, b, m, v):
        y = conv(x, k)
        a = s / jnp.sqrt(v + 1e-5)
        y = y * a.astype(dtype) + (b - m * a).astype(dtype)
        y = jax.nn.relu(y)
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def fused_stem(x, k, s, b, m, v):
        return fused_bn_relu_pool(conv(x, k), s, b, m, v, block_n=block_n)

    # ---- correctness (even 160 and odd 350 conv-out geometries) ----
    for hw in (160, 350):
        xs = jnp.asarray(rng.rand(4, hw, hw, 1).astype(np.float32), dtype)
        args = tuple(jnp.asarray(a) for a in (kern, scale, bias, mean, var))
        ref = np.asarray(jax.jit(xla_stem)(xs, *args), np.float32)
        got = np.asarray(jax.jit(fused_stem)(xs, *args), np.float32)
        # the kernel applies the BN affine in f32 (more precise than the
        # XLA reference's bf16 affine) — differences are bf16 rounding
        err = float(np.max(np.abs(ref - got))
                    / (np.max(np.abs(ref)) + 1e-9))
        print(json.dumps({"check": f"parity@{hw}", "shape": list(got.shape),
                          "rel_err": err}), flush=True)
        assert ref.shape == got.shape and err < 1e-2, (ref.shape, err)

    # ---- timing ----
    x = jnp.asarray(rng.rand(slices, 160, 160, 1).astype(np.float32),
                    dtype=dtype)
    args = tuple(jnp.asarray(a) for a in (kern, scale, bias, mean, var))

    def timed(tag, fn):
        @jax.jit
        def chain(x, *a):
            def body(acc, eps):
                out = fn(x + eps.astype(x.dtype), *a)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters, dtype=jnp.float32)
                                  * 1e-6)
            return acc
        np.asarray(chain(x, *args))
        t0 = time.perf_counter()
        np.asarray(chain(x, *args))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)

    timed("xla stem+bn+relu+pool (bf16)", xla_stem)
    timed(f"conv + pallas bn_relu_pool block_n={block_n}", fused_stem)


if __name__ == "__main__":
    main()
