"""Prototype: Pallas int8 implicit-GEMM 3x3/s1 SAME conv vs XLA.

XLA's s8xs8->s32 convs plateau at ~100 TOPS (25% of v5e int8 peak) at the
resnet50 slice-branch shapes (scripts/exp_int8.py). This prototype tests
whether a Pallas kernel — per-tap static-slice + (M, C)@(C, Cout) MXU dots
accumulated in VMEM — can beat that. Correctness vs lax.conv in interpret
mode on CPU; timing on TPU.

Run: python scripts/exp_pallas_conv.py [cpu|tpu]
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_conv(H, W, C, Cout, tile_b, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, w_ref, o_ref):
        # x_ref: (tile_b, H+2, W+2, C) int8 (pre-padded)
        # w_ref: (9, C, Cout) int8
        # o_ref: (tile_b, H, W, Cout) int32
        acc = jnp.zeros((tile_b * H * W, Cout), jnp.int32)
        for tap in range(9):
            dy, dx = tap // 3, tap % 3
            patch = x_ref[:, dy:dy + H, dx:dx + W, :]
            patch = patch.reshape(tile_b * H * W, C)
            acc = acc + jax.lax.dot_general(
                patch, w_ref[tap],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = acc.reshape(tile_b, H, W, Cout)

    @jax.jit
    def conv(xp, w9):
        B = xp.shape[0]
        grid = (B // tile_b,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_b, H + 2, W + 2, C),
                             lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((9, C, Cout), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_b, H, W, Cout),
                                   lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.int32),
            interpret=interpret,
        )(xp, w9)

    return conv


def main():
    import jax
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    interpret = mode == "cpu"
    rng = np.random.RandomState(0)

    # correctness at a small shape
    B, H, W, C, Cout, TB = 4, 10, 10, 128, 128, 2
    x = rng.randint(-30, 30, (B, H, W, C)).astype(np.int8)
    w = rng.randint(-30, 30, (3, 3, C, Cout)).astype(np.int8)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, C, Cout)

    conv = make_conv(H, W, C, Cout, TB, interpret)
    got = np.asarray(conv(jnp.asarray(xp), jnp.asarray(w9)))
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    np.testing.assert_array_equal(got, want)
    print(json.dumps({"correctness": "ok", "mode": mode}), flush=True)
    if interpret:
        return

    # timing at the resnet50@160^2 stage shapes (4096-slice dess batch)
    # tile_b sized so in+out+weights blocks fit VMEM (~16MB):
    #   out block = TB*H*W*Cout*4 (int32) dominates
    for (H2, W2, C2, tag, TB2) in ((20, 20, 128, "stage2", 8),
                                   (10, 10, 256, "stage3", 16),
                                   (5, 5, 512, "stage4", 32)):
        B2 = 4096
        x = rng.randint(-30, 30, (B2, H2, W2, C2)).astype(np.int8)
        w = rng.randint(-30, 30, (3, 3, C2, C2)).astype(np.int8)
        xp = jnp.asarray(np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        w9 = jnp.asarray(w.reshape(9, C2, C2))
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        conv = make_conv(H2, W2, C2, C2, TB2, False)

        iters = 8

        @jax.jit
        def chain_pallas(xp, w9):
            def body(acc, i):
                # perturb the input each iteration or XLA hoists the conv
                xi = xp + (i % 2).astype(jnp.int8)
                out = conv(xi, w9)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc

        @jax.jit
        def chain_xla(xj, wj):
            def body(acc, i):
                xi = xj + (i % 2).astype(jnp.int8)
                out = lax.conv_general_dilated(
                    xi, wj, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc

        gops = 2 * B2 * H2 * W2 * C2 * C2 * 9 / 1e9
        for name, fn, a, b in (("pallas", chain_pallas, xp, w9),
                               ("xla", chain_xla, xj, wj)):
            np.asarray(fn(a, b)); np.asarray(fn(a, b))
            t0 = time.perf_counter()
            np.asarray(fn(a, b))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "variant": f"{tag} {name}", "ms": round(dt * 1e3, 3),
                "tops": round(gops / dt / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
