"""Per-stage timings of the dess-branch FE (resnet50@160², 4096 slices).

The int8 dess FE runs at ~36 effective TOPS while isolated 3×3 int8 convs
hit ~100 (exp_int8.py) — this profiler finds where the 151 ms goes by
timing truncated forwards (ResNetFE.stop_after) and differencing
consecutive prefixes. apply() reuses the FULL variables dict (truncated
graphs just leave later params unused).

Run on TPU: python scripts/bench_fe_stages.py [slices] [quant]
  slices: CNN slice batch (default 4096 = flagship batch-64 dess)
  quant:  int8 (default) | none
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

    slices = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    quant = (sys.argv[2] if len(sys.argv) > 2 else "int8")
    quant = None if quant in ("none", "") else quant
    iters = 8
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    x = jnp.asarray(rng.rand(slices, 160, 160, 1).astype(np.float32))

    fe_full = FE_ARCHS["resnet50"](with_gap=True, dtype=dtype)
    v = fe_full.init(jax.random.key(0), x[:2], train=False)
    if quant == "int8":
        fe_cal = FE_ARCHS["resnet50"](with_gap=True, dtype=dtype,
                                      quant="calib")
        v_cal = fe_cal.init(jax.random.key(0), x[:2], train=False)
        _, muts = jax.jit(
            lambda vv, xx: fe_cal.apply(vv, xx, train=False,
                                        mutable=["quant_acts"]))(
            {**v, "quant_acts": v_cal["quant_acts"]}, x[:64])
        v = {**v, "quant_acts": muts["quant_acts"]}

    def timed(tag, fe):
        @jax.jit
        def chain(v, x):
            def body(acc, eps):
                out = fe.apply(v, x + eps, train=False)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(iters, dtype=jnp.float32) * 1e-6)
            return acc

        np.asarray(chain(v, x)); np.asarray(chain(v, x))
        t0 = time.perf_counter()
        np.asarray(chain(v, x))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"prefix": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)
        return dt

    prev, rows = 0.0, []
    for tag in ("stem", "stage1", "stage2", "stage3", "stage4"):
        fe = FE_ARCHS["resnet50"](with_gap=True, dtype=dtype, quant=quant,
                                  stop_after=None if tag == "stage4" else tag)
        dt = timed(tag, fe)
        rows.append((tag, dt - prev))
        prev = dt
    print(json.dumps({"per_stage_ms":
                      {t: round(d * 1e3, 2) for t, d in rows}}))


if __name__ == "__main__":
    main()
