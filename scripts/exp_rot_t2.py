"""Quick: t2 (S=25) rotate variants on TPU — lane-pad targets."""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.ops.rotate import rotate3d_in_slice

    rng = np.random.RandomState(0)
    t2 = jnp.asarray(rng.rand(16, 1, 320, 320, 25).astype(np.float32))
    theta = jnp.asarray(0.2)
    iters = 4

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

    timed("rot3d_t2_pad128", lambda x: jax.vmap(
        lambda im: rotate3d_in_slice(im, theta))(x), t2)


if __name__ == "__main__":
    main()
