"""Component timings of the POST-downscale train augmentation (147.6 ms
at batch 16 per bench_train_decompose; round-2's "~30 ms" was wrong).

Times, scan-chained at batch 16: the f32-HIGHEST downscale of the raw
volumes (train path keeps the exact chain), then each augment component
at the downscaled shapes (rotate gathers / gamma pow / unit-range +
normalize passes).

Run on TPU: python scripts/bench_aug_post.py [batch]
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
                                                  normalize, to_unit_range)
    from oaprogressionmmf_tpu.ops.resize import interpolate
    from oaprogressionmmf_tpu.ops.rotate import rotate2d, rotate3d_in_slice

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = 4
    rng = np.random.RandomState(0)

    xr_raw = jnp.asarray(
        (rng.rand(batch, 1, 700, 700) * 255).astype(np.uint8))
    dess_raw = jnp.asarray(
        (rng.rand(batch, 1, 320, 320, 128) * 255).astype(np.uint8))
    t2_raw = jnp.asarray(
        rng.rand(batch, 1, 320, 320, 25).astype(np.float32) * 0.1)

    xr = jnp.asarray(rng.rand(batch, 1, 350, 350).astype(np.float32))
    dess = jnp.asarray(rng.rand(batch, 1, 160, 160, 64).astype(np.float32))
    t2 = jnp.asarray(rng.rand(batch, 1, 160, 160, 25).astype(np.float32))

    def timed(tag, fn, *args):
        @jax.jit
        def chain(*args):
            def body(acc, i):
                args_i = tuple(
                    a + (i % 2).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.integer)
                    else a + i.astype(a.dtype) * 1e-6 for a in args)
                out = fn(*args_i)
                if not isinstance(out, tuple):
                    out = (out,)
                return acc + sum(jnp.sum(o.astype(jnp.float32))
                                 for o in out), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc
        np.asarray(chain(*args)); np.asarray(chain(*args))
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)

    timed("downscale_f32_highest_all",
          lambda a, b, c: (interpolate(a.astype(jnp.float32), (0.5, 0.5)),
                           interpolate(b.astype(jnp.float32),
                                       (0.5, 0.5, 0.5)),
                           interpolate(c, (0.5, 0.5, 1.0))),
          xr_raw, dess_raw, t2_raw)

    theta = jnp.float32(0.2)
    timed("rot_dess_160_64",
          lambda v: jax.vmap(lambda im: rotate3d_in_slice(im, theta))(v),
          dess)
    timed("rot_t2_160_25",
          lambda v: jax.vmap(lambda im: rotate3d_in_slice(im, theta))(v), t2)
    timed("rot_xr_350",
          lambda v: jax.vmap(lambda im: rotate2d(im, theta))(v), xr)
    timed("gamma_dess",
          lambda v: gamma_correction(v, jnp.float32(1.3)), dess)
    timed("unitrange_norm_all",
          lambda a, b, c: tuple(
              normalize(to_unit_range(x), [0.5], [0.3]) for x in (a, b, c)),
          xr, dess, t2)


if __name__ == "__main__":
    main()
