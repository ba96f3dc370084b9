"""int8 activation residency: keep the FE's inter-conv tensors int8.

Stage bisection (BENCH_NOTES round 3) shows stem/stage1 2-2.7x over their
traffic rooflines. The current int8 path quantizes each conv's INPUT from
bf16, so every inter-conv tensor is materialized bf16 (2B/elt) and the
conv's s32 output may materialize at 4B/elt before the dequant fusion.
If instead each conv's epilogue (dequant -> BN affine -> relu -> requant
with the NEXT conv's static scale) emits int8 directly, inter-layer
traffic drops 2x and the s32 materialization question becomes moot.

Variants, full stage1 (3 bottlenecks, in (N,40,40,64) -> (N,40,40,256)):
  A  current:   per conv bf16 -> q -> conv_s32 -> deq bf16 -> BN -> relu
  B  resident:  int8 tensors between convs; epilogue = scale*s32+bias,
                relu, requant; residual carried int8
  C  resident + conv preferred_element_type=f32 (emit f32, skip s32
                materialization if the backend allows it)

Numerics note: A and B apply the SAME quantization points (the next
conv's input quantization in A == the producer's requant in B); they
differ only by the bf16 intermediate rounding, checked <= ~1e-2 rel.

Run on TPU: python scripts/exp_int8_residency.py [n_slices]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = 8
    rng = np.random.RandomState(0)

    # stage1 of resnet50: 3 bottlenecks; (cin, width, cout)
    blocks = [(64, 64, 256), (256, 64, 256), (256, 64, 256)]
    hw = 40

    def mk_kernel(ks, cin, cout):
        w = rng.randn(ks, ks, cin, cout).astype(np.float32) / np.sqrt(
            ks * ks * cin)
        s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s_w.astype(np.float32))

    # per-conv params: kernels, weight scales, BN affine (a, b), static
    # activation scales (realistic ~relu-output magnitudes)
    params = []
    for bi, (cin, width, cout) in enumerate(blocks):
        blk = {}
        for tag, ks, ci, co in [("c1", 1, cin, width),
                                ("c2", 3, width, width),
                                ("c3", 1, width, cout)]:
            kq, sw = mk_kernel(ks, ci, co)
            a = jnp.asarray(
                (0.5 + rng.rand(co)).astype(np.float32))      # BN scale
            b = jnp.asarray(
                (rng.randn(co) * 0.1).astype(np.float32))     # BN bias
            blk[tag] = (kq, sw, a, b)
        if bi == 0:
            kq, sw = mk_kernel(1, cin, cout)
            a = jnp.asarray((0.5 + rng.rand(cout)).astype(np.float32))
            b = jnp.asarray((rng.randn(cout) * 0.1).astype(np.float32))
            blk["ds"] = (kq, sw, a, b)
        params.append(blk)

    # static input scales per conv (calibrated): model activations in
    # [0, ~4] after relu -> s_act = 4/127
    s_act = np.float32(4.0 / 127.0)

    def conv(xq, kq, strides=(1, 1), padding="SAME", out_dtype=jnp.int32):
        return jax.lax.conv_general_dilated(
            xq, kq, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    def quant(x, s):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    # ---- A: current pattern (bf16 between convs) ----
    def block_A(x_bf16, blk, first):
        def convbnrelu(x, p, ks, relu=True):
            kq, sw, a, b = p
            xq = quant(x, s_act)
            y = conv(xq, kq, padding="SAME" if ks == 3 else "VALID")
            y = (y.astype(jnp.float32) * (s_act * sw)).astype(jnp.bfloat16)
            y = y * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
            return nn_relu(y) if relu else y

        y = convbnrelu(x_bf16, blk["c1"], 1)
        y = convbnrelu(y, blk["c2"], 3)
        y = convbnrelu(y, blk["c3"], 1, relu=False)
        if first:
            r = convbnrelu(x_bf16, blk["ds"], 1, relu=False)
        else:
            r = x_bf16
        return nn_relu(y + r)

    def nn_relu(x):
        return jnp.maximum(x, 0)

    def stage_A(x_bf16):
        for bi, blk in enumerate(params):
            x_bf16 = block_A(x_bf16, blk, bi == 0)
        return x_bf16

    # ---- B: int8-resident ----
    def epi_q(y_s32, p, relu=True):
        kq, sw, a, b = p
        y = y_s32.astype(jnp.float32) * (s_act * sw * a) + b
        if relu:
            y = jnp.maximum(y, 0)
        return quant(y, s_act)

    def block_B(xq, blk, first):
        y = conv(xq, blk["c1"][0], padding="VALID")
        y = epi_q(y, blk["c1"])
        y = conv(y, blk["c2"][0], padding="SAME")
        y = epi_q(y, blk["c2"])
        y3 = conv(y, blk["c3"][0], padding="VALID")
        kq, sw, a, b = blk["c3"]
        main = y3.astype(jnp.float32) * (s_act * sw * a) + b
        if first:
            rds = conv(xq, blk["ds"][0], padding="VALID")
            kqd, swd, ad, bd = blk["ds"]
            res = rds.astype(jnp.float32) * (s_act * swd * ad) + bd
        else:
            res = xq.astype(jnp.float32) * s_act
        return quant(jnp.maximum(main + res, 0), s_act)

    def stage_B(xq):
        for bi, blk in enumerate(params):
            xq = block_B(xq, blk, bi == 0)
        return xq.astype(jnp.bfloat16) * jnp.bfloat16(s_act)

    # ---- C: resident, conv emits f32 directly ----
    def block_C(xq, blk, first):
        def epi(y, p, relu=True):
            kq, sw, a, b = p
            y = y * (s_act * sw * a) + b
            if relu:
                y = jnp.maximum(y, 0)
            return quant(y, s_act)
        y = epi(conv(xq, blk["c1"][0], padding="VALID",
                     out_dtype=jnp.float32), blk["c1"])
        y = epi(conv(y, blk["c2"][0], padding="SAME",
                     out_dtype=jnp.float32), blk["c2"])
        y3 = conv(y, blk["c3"][0], padding="VALID", out_dtype=jnp.float32)
        kq, sw, a, b = blk["c3"]
        main = y3 * (s_act * sw * a) + b
        if first:
            rds = conv(xq, blk["ds"][0], padding="VALID",
                       out_dtype=jnp.float32)
            kqd, swd, ad, bd = blk["ds"]
            res = rds * (s_act * swd * ad) + bd
        else:
            res = xq.astype(jnp.float32) * s_act
        return quant(jnp.maximum(main + res, 0), s_act)

    def stage_C(xq):
        for bi, blk in enumerate(params):
            xq = block_C(xq, blk, bi == 0)
        return xq.astype(jnp.bfloat16) * jnp.bfloat16(s_act)

    x_f = np.abs(rng.randn(n, hw, hw, 64)).astype(np.float32)
    x_bf16 = jnp.asarray(x_f.astype(jnp.bfloat16))
    xq0 = jnp.asarray(np.clip(np.round(x_f / s_act), -127, 127)
                      .astype(np.int8))

    # numerics: B vs A on a small slice
    a_out = np.asarray(jax.jit(stage_A)(x_bf16[:8]), np.float32)
    b_out = np.asarray(jax.jit(stage_B)(xq0[:8]), np.float32)
    denom = np.abs(a_out).mean() + 1e-6
    print(json.dumps({"check": "B_vs_A_mean_rel_err",
                      "err": round(float(np.abs(a_out - b_out).mean()
                                         / denom), 5)}), flush=True)

    def timed(tag, fn, x):
        @jax.jit
        def chain(x):
            def body(acc, i):
                xi = x + (i % 2).astype(x.dtype)
                return acc + jnp.sum(fn(xi).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc
        np.asarray(chain(x))
        t0 = time.perf_counter()
        np.asarray(chain(x))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)

    timed("A_stage1_bf16_resident", stage_A, x_bf16)
    timed("B_stage1_int8_resident", stage_B, xq0)
    timed("C_stage1_int8_resident_f32emit", stage_C, xq0)


if __name__ == "__main__":
    main()
