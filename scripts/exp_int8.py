"""One-off: does int8 double conv throughput on this chip (v5e MXU 2x
int8 peak), at the resnet50 slice-branch shapes that gate eval?

Variants (scan-chained, materialized; params passed as jit args):
  A. bf16 3x3 s1 conv at the stage-3 bottleneck shape (the hot one)
  B. int8 same conv (s8 x s8 -> s32, preferred_element_type)
  C. bf16 1x1 conv stage-3 (projection)
  D. int8 same
  E. bf16 vs int8 dot_general sanity (8192x8192x8192-ish)

Run on TPU: python scripts/exp_int8.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)

    def timed_conv(name, batch, hw, cin, cout, k, dtype):
        x_host = (rng.rand(batch, hw, hw, cin) * 4 - 2)
        w_host = (rng.rand(k, k, cin, cout) * 0.2 - 0.1)
        if dtype == "int8":
            x = jnp.asarray(np.clip(x_host * 30, -127, 127).astype(np.int8))
            w = jnp.asarray(np.clip(w_host * 600, -127, 127).astype(np.int8))
            pref = jnp.int32
        else:
            x = jnp.asarray(x_host, jnp.bfloat16)
            w = jnp.asarray(w_host, jnp.bfloat16)
            pref = jnp.float32

        @jax.jit
        def chain(w, x):
            def body(acc, i):
                xi = x + i.astype(x.dtype)
                out = lax.conv_general_dilated(
                    xi, w, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=pref)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(ITERS, dtype=jnp.int32))
            return acc

        np.asarray(chain(w, x)); np.asarray(chain(w, x))
        t0 = time.perf_counter()
        np.asarray(chain(w, x))
        dt = (time.perf_counter() - t0) / ITERS
        gmac = batch * hw * hw * cin * cout * k * k / 1e9
        tops = 2 * gmac / dt / 1e3
        peak = 394.0 if dtype == "int8" else 197.0
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                          "tops": round(tops, 1),
                          "peak_pct": round(100 * tops / peak, 1)}),
              flush=True)
        return dt

    # dess branch after downscale: slices fold to batch 1024, stage3 maps
    # are 10x10x1024... use the per-stage shapes of resnet50 @160^2:
    # stage2: 40^2 x 128 (3x3), stage3: 20^2 x 256, stage4: 10^2 x 512
    for hw, c, tag in ((40, 128, "stage2"), (20, 256, "stage3"),
                      (10, 512, "stage4")):
        a = timed_conv(f"A bf16 3x3 {tag} B1024", 1024, hw, c, c, 3, "bf16")
        b = timed_conv(f"B int8 3x3 {tag} B1024", 1024, hw, c, c, 3, "int8")
        print(json.dumps({"speedup": round(a / b, 2), "tag": tag}),
              flush=True)

    a = timed_conv("C bf16 1x1 stage3 B1024", 1024, 20, 1024, 256, 1, "bf16")
    b = timed_conv("D int8 1x1 stage3 B1024", 1024, 20, 1024, 256, 1, "int8")
    print(json.dumps({"speedup": round(a / b, 2), "tag": "1x1"}), flush=True)

    # dot sanity
    def timed_dot(name, dtype):
        m = 4096
        if dtype == "int8":
            x = jnp.asarray(rng.randint(-127, 127, (m, m), np.int8))
            w = jnp.asarray(rng.randint(-127, 127, (m, m), np.int8))
            pref = jnp.int32
        else:
            x = jnp.asarray(rng.rand(m, m), jnp.bfloat16)
            w = jnp.asarray(rng.rand(m, m), jnp.bfloat16)
            pref = jnp.float32

        @jax.jit
        def chain(w, x):
            def body(acc, i):
                out = lax.dot_general(x + i.astype(x.dtype), w,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=pref)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(ITERS, dtype=jnp.int32))
            return acc

        np.asarray(chain(w, x)); np.asarray(chain(w, x))
        t0 = time.perf_counter()
        np.asarray(chain(w, x))
        dt = (time.perf_counter() - t0) / ITERS
        tops = 2 * m**3 / dt / 1e12
        peak = 394.0 if dtype == "int8" else 197.0
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                          "tops": round(tops, 1),
                          "peak_pct": round(100 * tops / peak, 1)}),
              flush=True)

    timed_dot("E bf16 dot 4096^3", "bf16")
    timed_dot("F int8 dot 4096^3", "int8")


if __name__ == "__main__":
    main()
