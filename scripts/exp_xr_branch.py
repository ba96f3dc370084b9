"""One-off: why is the XR branch (resnext50 @350², batch 16) at ~8% MXU?

Variants timed (scan-chained, materialized):
  A. resnext50_32x4d @350², B=16   (production)
  B. resnext50_32x4d @350², B=64   (batch sensitivity)
  C. resnet50        @350², B=16   (grouped-conv isolation)
  D. resnext50_32x4d @352², B=16   (spatial 32-alignment)

Run on TPU: python scripts/exp_xr_branch.py
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

    from oaprogressionmmf_tpu.models.resnet import FE_ARCHS

    ITERS = 8
    rng = np.random.RandomState(0)

    def timed(name, arch, size, batch, gmac_per_img):
        fe = FE_ARCHS[arch](with_gap=True, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.rand(batch, size, size, 1).astype(np.float32))
        v = fe.init(jax.random.key(0), x[:2], train=False)

        @jax.jit
        def chain(v, x):
            def body(acc, eps):
                out = fe.apply(v, x + eps, train=False)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(ITERS, dtype=jnp.float32) * 1e-6)
            return acc

        np.asarray(chain(v, x))
        np.asarray(chain(v, x))
        t0 = time.perf_counter()
        np.asarray(chain(v, x))
        dt = (time.perf_counter() - t0) / ITERS
        tflops = 2 * gmac_per_img * batch / dt / 1e3
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "tflops": round(tflops, 1),
                          "mxu_pct": round(100 * tflops / 197, 1)}))

    # resnext50 @224² = 4.23 GMAC; resnet50 @224² = 4.09 GMAC
    s350 = (350 / 224) ** 2
    s352 = (352 / 224) ** 2
    timed("A resnext50 350^2 B16", "resnext50_32x4d", 350, 16, 4.23 * s350)
    timed("B resnext50 350^2 B64", "resnext50_32x4d", 350, 64, 4.23 * s350)
    timed("C resnet50  350^2 B16", "resnet50", 350, 16, 4.09 * s350)
    timed("D resnext50 352^2 B16", "resnext50_32x4d", 352, 16, 4.23 * s352)


if __name__ == "__main__":
    main()
