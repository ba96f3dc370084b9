"""Decompose the flagship train step's residual tail (TODO #2).

Round-2/3 numbers: full step 626 ms/batch-16 (post-downscale augment) while
augment ≈ 30 ms and fwd+bwd ≈ 429.6 ms — leaving ~165 ms unexplained.
Adam traffic for 398M f32 params is only ~11 GB ≈ 14 ms, so the tail must
be something structural. This probe times, scan-chained in one dispatch
(per CLAUDE.md harness rules: perturb every input, reduce over every
output, params as jit args):

  P1  fwd+bwd             (loss + all grad leaves + BN stats reduced)
  P2  fwd+bwd+tx.update   (+ updates and opt-state leaves reduced)
  P3  full train_step     (sequential-dispatch production form)

Run: python scripts/bench_train_decompose.py [batch] [iters]
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_train_step import MODALS, MODEL_CFG  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.config import config_from_dict
    from oaprogressionmmf_tpu.train.state import TrainState
    from oaprogressionmmf_tpu.train.trainer import _shared_runtime

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.RandomState(0)

    # post-downscale augment: the fast production configuration the 626 ms
    # number was measured under
    os.environ.setdefault("OAPROG_AUGMENT_FULL_RES", "0")

    config = config_from_dict({
        "model": MODEL_CFG,
        "training": {
            "loss": {"name": "FocalLoss",
                     "params": {"reduction": "mean", "gamma": 2.0}},
            "optim": {"name": "Adam", "lr_init": 1e-4, "weight_decay": 1e-4},
            "sched": {"name": "CustomWarmupStaticDecayLR",
                      "params": {"epochs_warmup": 5, "epochs_static": 100,
                                 "epochs_decay": 1}},
        },
    })
    rt = _shared_runtime(config, tuple(MODALS), MODEL_CFG["downscale"],
                         steps_per_epoch=40, compute_dtype=jnp.bfloat16)

    xs = (
        jnp.asarray((rng.rand(batch, 1, 700, 700) * 255).astype(np.uint8)),
        jnp.asarray(
            (rng.rand(batch, 1, 320, 320, 128) * 255).astype(np.uint8)),
        jnp.asarray(
            rng.rand(batch, 1, 320, 320, 25).astype(np.float32) * 0.1),
        jnp.asarray(rng.rand(batch, 1, 9).astype(np.float32)),
    )
    ys = jnp.asarray(np.random.RandomState(1).randint(0, 2, batch)
                     .astype(np.int32))

    variables = rt.model.init(jax.random.key(0), *rt.preproc_eval(xs),
                              train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = rt.tx.init(params)
    model, tx, loss_fn = rt.model, rt.tx, rt.loss_fn
    preproc_train = rt.preproc_train

    def tree_red(t):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(t))

    def fwd_bwd(params, batch_stats, xs, ys, key):
        k_aug, k_drop = jax.random.split(key)
        xs = preproc_train(xs, k_aug)

        def loss_of(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, *xs, train=True,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])
            logits = out["main"] if isinstance(out, dict) else out
            return loss_fn(logits, ys), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        return loss, grads, new_stats

    def chain(fn, n_outputs_reduce):
        @jax.jit
        def run(params, batch_stats, opt_state, xs, ys, key):
            def body(acc, i):
                # perturb every array input (defeat hoisting/CSE)
                xs_i = tuple(
                    x + (i % 2).astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.integer)
                    else x + i.astype(x.dtype) * 1e-6 for x in xs)
                out = fn(params, batch_stats, opt_state, xs_i, ys,
                         jax.random.fold_in(key, i))
                return acc + tree_red(out), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc
        return run

    def p1(params, batch_stats, opt_state, xs, ys, key):
        loss, grads, new_stats = fwd_bwd(params, batch_stats, xs, ys, key)
        return (loss, grads, new_stats)

    def p2(params, batch_stats, opt_state, xs, ys, key):
        loss, grads, new_stats = fwd_bwd(params, batch_stats, xs, ys, key)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (loss, updates, new_stats, new_opt)

    key = jax.random.key(0)
    for tag, fn in [("P1_fwd_bwd", p1), ("P2_fwd_bwd_opt", p2)]:
        run = chain(fn, None)
        np.asarray(run(params, batch_stats, opt_state, xs, ys, key))
        t0 = time.perf_counter()
        np.asarray(run(params, batch_stats, opt_state, xs, ys, key))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 1),
                          "knees_per_sec": round(batch / dt, 1)}),
              flush=True)

    # P3: production step, sequential dispatch, donated state
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    k = jax.random.key(1)
    state, loss, _ = rt.train_step(state, xs, ys, k)
    np.asarray(loss)
    t0 = time.perf_counter()
    n_steps = max(iters, 4)
    for i in range(n_steps):
        state, loss, _ = rt.train_step(state, xs, ys,
                                       jax.random.fold_in(k, i))
        np.asarray(loss)
    dt = (time.perf_counter() - t0) / n_steps
    print(json.dumps({"stage": "P3_full_train_step", "ms": round(dt * 1e3, 1),
                      "knees_per_sec": round(batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
