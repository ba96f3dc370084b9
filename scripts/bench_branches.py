"""Per-branch device timings of the flagship eval path (accurate form).

Each variant is scan-chained inside ONE dispatch and materialized to host,
so the remote-tunnel RTT (~25-35 ms/dispatch) amortizes away — the earlier
per-branch ablation in BENCH_NOTES.md was RTT-inflated. Timings here are
true device compute per batch.

Run on the TPU (default env): python scripts/bench_branches.py [batch]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# importable from anywhere without touching PYTHONPATH (which carries the
# TPU-backend sitecustomize in this environment)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.models.feat import FeaT
    from oaprogressionmmf_tpu.models.resnet import FE_ARCHS
    from oaprogressionmmf_tpu.train.trainer import make_preprocess_fn

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.RandomState(0)

    def timed(name, fn, variables, *args):
        """scan-chain `iters` applications of fn inside one jit dispatch.

        `variables` is passed as a jit argument (closing over params would
        embed them as HLO constants and blow the remote-compile body
        limit)."""
        @jax.jit
        def chain(variables, *args):
            def body(acc, eps):
                out = fn(variables,
                         *(a + eps.astype(a.dtype) for a in args))
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(iters, dtype=jnp.float32) * 1e-6)
            return acc

        np.asarray(chain(variables, *args))          # compile + warmup
        np.asarray(chain(variables, *args))
        t0 = time.perf_counter()
        np.asarray(chain(variables, *args))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"branch": name, "ms_per_batch":
                          round(dt * 1e3, 2), "batch": batch}))
        return dt

    dtype = jnp.bfloat16

    # ---- DESS branch: 64 slices/knee through resnet50 @160^2 ----
    fe_mr = FE_ARCHS["resnet50"](with_gap=True, dtype=dtype)
    x_dess = jnp.asarray(
        rng.rand(batch * 64, 160, 160, 1).astype(np.float32))
    v_mr = fe_mr.init(jax.random.key(0), x_dess[:2], train=False)

    def dess_fwd(v, x):
        return fe_mr.apply(v, x, train=False)

    t_dess = timed("dess_fe(resnet50,160^2,B*64)", dess_fwd, v_mr, x_dess)

    # ---- T2 branch: 25 slices/knee ----
    x_t2 = jnp.asarray(rng.rand(batch * 25, 160, 160, 1).astype(np.float32))
    t_t2 = timed("t2_fe(resnet50,160^2,B*25)", dess_fwd, v_mr, x_t2)

    # ---- XR branch: resnext50 @350^2, batch B ----
    fe_xr = FE_ARCHS["resnext50_32x4d"](with_gap=True, dtype=dtype)
    x_xr = jnp.asarray(rng.rand(batch, 350, 350, 1).astype(np.float32))
    v_xr = fe_xr.init(jax.random.key(1), x_xr[:2], train=False)
    t_xr = timed("xr_fe(resnext50,350^2,B)",
                 lambda v, x: fe_xr.apply(v, x, train=False), v_xr, x_xr)

    # ---- int8 variants of the three FE branches (fe.quant path) ----
    def quantized(arch, v, x, tag):
        fe_cal = FE_ARCHS[arch](with_gap=True, dtype=dtype, quant="calib")
        v_cal = fe_cal.init(jax.random.key(0), x[:2], train=False)
        _, muts = jax.jit(
            lambda vv, xx: fe_cal.apply(vv, xx, train=False,
                                        mutable=["quant_acts"]))(
            {**v, "quant_acts": v_cal["quant_acts"]}, x)
        fe_q = FE_ARCHS[arch](with_gap=True, dtype=dtype, quant="int8")
        vq = {**v, "quant_acts": muts["quant_acts"]}
        return timed(tag, lambda vv, xx: fe_q.apply(vv, xx, train=False),
                     vq, x)

    t_dess_q = quantized("resnet50", v_mr, x_dess, "dess_fe int8")
    t_t2_q = quantized("resnet50", v_mr, x_t2, "t2_fe int8")
    t_xr_q = quantized("resnext50_32x4d", v_xr, x_xr, "xr_fe int8")

    # ---- FeaT stack: final CLS FeaT, 91 tokens, d=2048, depth 4 ----
    feat = FeaT(num_patches=91, patch_dim=2048, emb_dim=2048, depth=4,
                heads=8, mlp_dim=2048, num_classes=2, emb_dropout=0.1,
                with_cls=True, mlp_dropout=0.1, dtype=dtype)
    tokens = jnp.asarray(rng.rand(batch, 91, 2048).astype(np.float32))
    v_feat = feat.init(jax.random.key(2), tokens, deterministic=True)
    t_feat = timed("feat(91tok,d2048,x4)",
                   lambda v, t: feat.apply(v, t, deterministic=True)[0],
                   v_feat, tokens)

    # ---- eval preprocessing + downscale (all modalities) ----
    modals = ["xr_pa", "sag_3d_dess", "sag_t2_map", "clin"]
    downscale = [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]]
    preproc = make_preprocess_fn(modals, downscale, train=False)
    xs_raw = (
        jnp.asarray(rng.rand(batch, 1, 700, 700).astype(np.float32)),
        jnp.asarray(rng.rand(batch, 1, 320, 320, 128).astype(np.float32)),
        jnp.asarray(rng.rand(batch, 1, 320, 320, 25).astype(np.float32)),
        jnp.asarray(rng.rand(batch, 1, 9).astype(np.float32)),
    )
    def pre_all(_v, *xs):
        # reduce over EVERY modality or XLA dead-code-eliminates branches
        outs = preproc(xs)
        return jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])

    t_pre = timed("preproc+downscale", pre_all, {}, *xs_raw)

    total = t_dess + t_t2 + t_xr + t_feat + t_pre
    total_q = t_dess_q + t_t2_q + t_xr_q + t_feat + t_pre
    print(json.dumps({
        "sum_ms": round(total * 1e3, 2),
        "implied_knees_per_sec": round(batch / total, 1),
        "sum_ms_int8": round(total_q * 1e3, 2),
        "implied_int8": round(batch / total_q, 1)}))


if __name__ == "__main__":
    main()
