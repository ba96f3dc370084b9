"""Fast-path eval preproc: where do the milliseconds go, and does an
S-major raw layout fix the t2 lane-padding waste?

The int8 serving bench runs make_preprocess_fn(..., fast=True). The t2
raw volume (B,1,320,320,25) has a 25-wide minor dim — v5e tiles are
(8,128) lanes, so every pass over the raw t2 wastes ~5x traffic. Shipping
the raw volume S-major (B,1,25,320,320) from the host (a free layout
choice in the loader) and downscaling in that layout, transposing only
the 12x-smaller downscaled tensor, should reclaim it. Exact: same dots,
different axis order.

Cases (batch 64):
  all_fast          full fast preproc, all modalities (honest reduction)
  xr_fast / dess_fast / t2_fast     per-modality split
  t2_smajor         S-major raw + downscale + transpose-at-end
Run on TPU: python scripts/exp_preproc2.py [batch]
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

    from oaprogressionmmf_tpu.ops.preproc import MODALITY_STATS
    from oaprogressionmmf_tpu.ops.resize import interpolate_fast
    from oaprogressionmmf_tpu.train.trainer import make_preprocess_fn

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = 8
    rng = np.random.RandomState(0)

    xr = (rng.rand(batch, 1, 700, 700) * 255).astype(np.uint8)
    dess = (rng.rand(batch, 1, 320, 320, 128) * 255).astype(np.uint8)
    t2 = rng.rand(batch, 1, 320, 320, 25).astype(np.float32) * 0.1

    def timed(tag, fn, *args):
        @jax.jit
        def chain(*args):
            def body(acc, i):
                args_i = tuple(
                    a + (i % 2).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.integer)
                    else a + i.astype(a.dtype) * 1e-6 for a in args)
                outs = fn(*args_i)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                return acc + sum(jnp.sum(o.astype(jnp.float32))
                                 for o in outs), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc
        np.asarray(chain(*args))
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)

    modals = ["xr_pa", "sag_3d_dess", "sag_t2_map", "clin"]
    ds = [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]]
    pre_all = make_preprocess_fn(modals, ds, train=False, fast=True)
    clin = rng.rand(batch, 1, 9).astype(np.float32)
    timed("all_fast", lambda a, b, c, d: pre_all((a, b, c, d)),
          jnp.asarray(xr), jnp.asarray(dess), jnp.asarray(t2),
          jnp.asarray(clin))

    for m, x, d in [("xr", xr, ds[0]), ("dess", dess, ds[1]),
                    ("t2", t2, ds[2])]:
        key = {"xr": "xr_pa", "dess": "sag_3d_dess",
               "t2": "sag_t2_map"}[m]
        pre_1 = make_preprocess_fn([key], [d], train=False, fast=True)
        timed(f"{m}_fast", lambda a: pre_1((a,)), jnp.asarray(x))

    # S-major t2: raw (B,1,25,320,320); downscale r/c in-place (they are
    # the two minor dims), transpose the small result back to (...,S)
    t2s = np.ascontiguousarray(np.moveaxis(t2, -1, 2))
    mean, std = MODALITY_STATS["sag_t2_map"]

    def t2_smajor(x):
        red = tuple(range(1, x.ndim))
        lo = jnp.min(x, axis=red, keepdims=True)
        hi = jnp.max(x, axis=red, keepdims=True)
        y = interpolate_fast(x, (1.0, 0.5, 0.5))
        y = jnp.moveaxis(y, 2, -1)
        return ((y - lo) / (hi - lo) - mean) / std

    timed("t2_smajor", t2_smajor, jnp.asarray(t2s))


if __name__ == "__main__":
    main()
