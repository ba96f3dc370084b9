"""Slice-pairing hypothesis test: is the C=64 lane-padding tax real?

Stage bisection (BENCH_NOTES round 3) shows the FE stem/stage1 running
2-2.7x over their traffic rooflines while stage3/4 sit near the practical
int8 rate. Hypothesis: tensors with 64 channels pad to 128 lanes on v5e,
doubling effective HBM traffic. If true, packing TWO slices channel-wise
(batch N -> N/2, C 64 -> 128) and running the convs as 2 feature groups
(or block-diagonal dense, which XLA treats as a plain dense conv) halves
traffic — numerically exact.

Variants per shape (all int8 s8xs8->s32, epilogue dequant):
  A  baseline:       (N,   H, W, 64)  -> conv -> 64/256 out
  B  paired-dense:   (N/2, H, W, 128) -> dense conv -> 128/512 out
                     (2x the MACs of A — block-diagonal form)
  C  paired-grouped: (N/2, H, W, 128) -> feature_group_count=2
                     (exact MACs of A)

If B or C beat A at the stem/stage1 shapes, slice-pairing is the next
serving win; if not, the padding theory dies here (recorded either way).

Run on TPU: python scripts/exp_slice_pairing.py [n_slices]
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

    def q(x, axes):
        s = np.abs(x).max(axis=axes, keepdims=True) / 127.0
        return np.clip(np.round(x / s), -127, 127).astype(np.int8)

    def conv_int8(x, k, strides=(1, 1), padding="SAME", groups=1):
        y = jax.lax.conv_general_dilated(
            x, k, strides, padding, feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

    def timed(tag, fn, x, k):
        @jax.jit
        def chain(x, k):
            def body(acc, eps):
                xi = x + (eps * 1e6).astype(x.dtype) % 2
                return acc + jnp.sum(fn(xi, k).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters, dtype=jnp.float32)
                                  * 1e-6)
            return acc
        np.asarray(chain(x, k))
        t0 = time.perf_counter()
        np.asarray(chain(x, k))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)
        return dt

    shapes = [
        # (tag, H/W, kh/kw, cin, cout, strides)
        ("stem_7x7_1_64", 160, 7, 1, 64, (2, 2)),
        ("stage1_3x3_64_64", 40, 3, 64, 64, (1, 1)),
        ("stage1_1x1_64_256", 40, 1, 64, 256, (1, 1)),
        ("stage1_1x1_256_64", 40, 1, 256, 64, (1, 1)),
    ]
    for tag, hw, ks, cin, cout, st in shapes:
        xa = jnp.asarray(q(rng.randn(n, hw, hw, cin).astype(np.float32),
                           (1, 2, 3)))
        ka = jnp.asarray(q(rng.randn(ks, ks, cin, cout)
                           .astype(np.float32), (0, 1, 2)))
        timed(f"A_{tag}", lambda x, k: conv_int8(x, k, st), xa, ka)

        xb = jnp.asarray(np.asarray(xa).reshape(n // 2, 2, hw, hw, cin)
                         .transpose(0, 2, 3, 1, 4)
                         .reshape(n // 2, hw, hw, 2 * cin))
        kb = np.zeros((ks, ks, 2 * cin, 2 * cout), np.int8)
        kb[:, :, :cin, :cout] = np.asarray(ka)
        kb[:, :, cin:, cout:] = np.asarray(ka)
        timed(f"B_{tag}_paired_dense",
              lambda x, k: conv_int8(x, k, st), xb, jnp.asarray(kb))

        kc = jnp.concatenate([ka, ka], axis=3)  # (ks,ks,cin, 2*cout) g2
        timed(f"C_{tag}_paired_group2",
              lambda x, k: conv_int8(x, k, st, groups=2), xb, kc)


if __name__ == "__main__":
    main()
