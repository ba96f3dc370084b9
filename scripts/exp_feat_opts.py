"""FeaT serving micro-experiments at the flagship design point.

The final CLS FeaT (91 tokens, d=2048, depth 4, batch 64) measures
15.7 ms bf16 — ~25% MXU against a ~6 ms dense-dot roofline. Candidates:

  a) current: separate q/k/v dots + Pallas flash attention
  b) reference-attention: plain XLA dots for the (91x91) attention
     (flash's 512-program grid + 128-padding may dominate at tiny n)
  c) fused qkv: one (d, 3d) dot built by concatenating the three kernels
     at apply time (numerically identical; serving-only)

Run on TPU: python scripts/exp_feat_opts.py [batch] [tokens]
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

    from oaprogressionmmf_tpu.models.feat import FeaT

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 91
    iters = 16
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    x = jnp.asarray(rng.rand(batch, tokens, 2048).astype(np.float32))

    def timed(tag, fn, v):
        @jax.jit
        def chain(v, x):
            def body(acc, eps):
                out = fn(v, x + eps.astype(x.dtype))
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters, dtype=jnp.float32)
                                  * 1e-6)
            return acc
        np.asarray(chain(v, x))
        t0 = time.perf_counter()
        np.asarray(chain(v, x))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 2)}),
              flush=True)
        return dt

    def build(**kw):
        m = FeaT(num_patches=tokens, patch_dim=2048, emb_dim=2048, depth=4,
                 heads=8, mlp_dim=2048, num_classes=2, emb_dropout=0.1,
                 with_cls=True, mlp_dropout=0.1, dtype=dtype, **kw)
        v = m.init(jax.random.key(0), x[:2], deterministic=True)
        return m, v

    m_a, v_a = build()
    timed("flash+split-qkv (current)", lambda v, t: m_a.apply(
        v, t, deterministic=True)[0], v_a)

    m_b, v_b = build(attn_impl="reference")
    timed("xla-dots+split-qkv", lambda v, t: m_b.apply(
        v, t, deterministic=True)[0], v_b)

    m_c, v_c = build(attn_impl="reference", fuse_qkv=True)
    timed("xla-dots+fused-qkv", lambda v, t: m_c.apply(
        v, t, deterministic=True)[0], v_c)

    m_d, v_d = build(fuse_qkv=True)
    timed("flash+fused-qkv", lambda v, t: m_d.apply(
        v, t, deterministic=True)[0], v_d)


if __name__ == "__main__":
    main()
