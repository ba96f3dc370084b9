"""Component timings of the full-res train augmentation (stage A's 766 ms).

Times each piece of make_augment_fn + downscale per modality at batch 16
full-res, scan-chained on device. Identifies which op dominates the
augment-bound train step (rotate gathers vs gamma pow vs unit-range
reductions vs the f32-HIGHEST downscale chain).

Run on TPU: python scripts/bench_augment_parts.py [batch]
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

    from oaprogressionmmf_tpu.ops.preproc import (gamma_correction,
                                                  to_unit_range)
    from oaprogressionmmf_tpu.ops.resize import interpolate
    from oaprogressionmmf_tpu.ops.rotate import rotate2d, rotate3d_in_slice

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = 4
    rng = np.random.RandomState(0)

    xr = jnp.asarray(rng.rand(batch, 1, 700, 700).astype(np.float32))
    dess = jnp.asarray(rng.rand(batch, 1, 320, 320, 128).astype(np.float32))
    t2 = jnp.asarray(rng.rand(batch, 1, 320, 320, 25).astype(np.float32))

    def timed(tag, fn, *args):
        @jax.jit
        def chain(*args):
            def body(acc, i):
                out = fn(*(a + i * 1e-6 for a in args))
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters, dtype=jnp.float32))
            return acc

        np.asarray(chain(*args)); np.asarray(chain(*args))
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"part": tag, "ms": round(dt * 1e3, 1)}),
              flush=True)

    theta = jnp.asarray(0.2)

    timed("rot2d_xr700", lambda x: jax.vmap(
        lambda im: rotate2d(im, theta))(x), xr)
    timed("rot3d_dess", lambda x: jax.vmap(
        lambda im: rotate3d_in_slice(im, theta))(x), dess)
    timed("rot3d_t2", lambda x: jax.vmap(
        lambda im: rotate3d_in_slice(im, theta))(x), t2)
    timed("gamma_dess", lambda x: gamma_correction(x, 1.3), dess)
    timed("unitrange_dess", lambda x: jax.vmap(to_unit_range)(x), dess)
    timed("downscale_dess_f32", lambda x: interpolate(x, (0.5, 0.5, 0.5)),
          dess)
    timed("downscale_xr_f32", lambda x: interpolate(x, (0.5, 0.5)), xr)
    timed("downscale_t2_f32", lambda x: interpolate(x, (0.5, 0.5, 1.0)), t2)


if __name__ == "__main__":
    main()
