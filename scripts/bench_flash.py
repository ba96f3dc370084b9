"""Flash-attention at its design point: with_gap=false token counts.

SURVEY §5.7: with_gap=false FeaT sequences reach ~1.6-2.4k tokens (e.g.
MR1/dess 64 slices × 5×5 maps = 1600; XR+2MRI fusion ≈ 2.4k), where the
reference's materialized (B, H, N, N) scores are HBM-hostile. This script
checks kernel correctness against the XLA oracle at that size on the real
TPU and times fwd and fwd+bwd for both paths.

Run on TPU: python scripts/bench_flash.py [N] [batch]
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.ops.flash_attention import (
        attention_reference, flash_attention)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2432
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    H, D = 8, 256                  # flagship agg: 8 heads, 2048/8 emb
    ITERS = 8
    scale = (H * D) ** -0.5        # reference quirk: full-width scale

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(B, H, N, D).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.rand(B, H, N, D).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.rand(B, H, N, D).astype(np.float32), jnp.bfloat16)

    # ---- correctness at the design point (on-TPU, not interpret) ----
    want = np.asarray(attention_reference(q, k, v, scale)[0],
                      dtype=np.float32)
    got = np.asarray(flash_attention(q, k, v, scale=scale),
                     dtype=np.float32)
    err = float(np.max(np.abs(got - want)))
    print(json.dumps({"check": "fwd_vs_oracle", "N": N,
                      "max_abs_err": round(err, 6)}))
    assert err < 2e-2, "flash forward diverges from oracle at design point"

    def timed(name, fn, *args):
        @jax.jit
        def chain(*args):
            def body(acc, eps):
                out = fn(*(a + eps.astype(a.dtype) for a in args))
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(ITERS, dtype=jnp.float32) * 1e-6)
            return acc

        np.asarray(chain(*args))
        np.asarray(chain(*args))
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"bench": name, "N": N, "B": B,
                          "ms": round(dt * 1e3, 3)}))
        return dt

    timed("flash_fwd", lambda a, b, c: flash_attention(a, b, c, scale=scale),
          q, k, v)
    timed("xla_fwd",
          lambda a, b, c: attention_reference(a, b, c, scale)[0], q, k, v)

    def loss_flash(a, b, c):
        return jnp.sum(flash_attention(a, b, c, scale=scale)
                       .astype(jnp.float32) ** 2)

    def loss_xla(a, b, c):
        return jnp.sum(attention_reference(a, b, c, scale)[0]
                       .astype(jnp.float32) ** 2)

    gflash = jax.grad(loss_flash, argnums=(0, 1, 2))
    gxla = jax.grad(loss_xla, argnums=(0, 1, 2))

    # gradient correctness vs oracle
    gf = gflash(q, k, v)
    gx = gxla(q, k, v)
    gerr = max(float(np.max(np.abs(np.asarray(a, np.float32) -
                                   np.asarray(b, np.float32))))
               for a, b in zip(gf, gx))
    print(json.dumps({"check": "bwd_vs_oracle", "max_abs_err":
                      round(gerr, 6)}))

    timed("flash_fwd+bwd", lambda a, b, c: gflash(a, b, c)[0], q, k, v)
    timed("xla_fwd+bwd", lambda a, b, c: gxla(a, b, c)[0], q, k, v)


if __name__ == "__main__":
    main()
