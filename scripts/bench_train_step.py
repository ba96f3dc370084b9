"""Train-step component timings for the flagship model (scan-chained).

Decomposes the 12.7 knees/s (r1) full train step:
  A. augmentation pipeline alone (rotate/gamma on full-res volumes
     + downscale)
  B. fwd+bwd+Adam on pre-downscaled inputs (no augment)
  C. full production train step (augment + fwd/bwd/opt)

Run on TPU: python scripts/bench_train_step.py [batch] [iters]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

MODALS = ["xr_pa", "sag_3d_dess", "sag_t2_map", "clin"]

MODEL_CFG = {
    "name": "XR1MR2C1CnnTrf",
    "input_size": [[700, 700], [320, 320, 128], [320, 320, 25], [16]],
    "downscale": [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]],
    "input_channels": 1, "output_channels": 2, "output_type": "dict",
    "debug": False, "restore_weights": False,
    "fe": {
        "xr": {"arch": "resnext50_32x4d", "pretrained": False,
               "with_gap": True, "dropout": 0.1},
        "mr": {"arch": "resnet50", "pretrained": False, "with_gap": True,
               "dropout": 0.1},
        "clin": {"dim_in": 9, "dim_out": 2048, "dropout": 0.1},
    },
    "agg": {"num_slices": [1, 64, 25, 1], "depth": 4, "heads": 8,
            "emb_dropout": 0.1, "mlp_dim": 2048, "mlp_dropout": 0.1},
}


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.config import config_from_dict
    from oaprogressionmmf_tpu.train.state import TrainState
    from oaprogressionmmf_tpu.train.trainer import (_shared_runtime,
                                                    make_preprocess_fn)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.RandomState(0)

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

    # uint8 raw XR/DESS exactly as the host pipeline ships them (the f32
    # form quadruples the argument HBM and pushes the step into spills)
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
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=rt.tx.init(variables["params"]))

    # which stages to run (each costs a multi-minute remote compile;
    # remat/augment experiments usually only need C or D)
    import os
    stages = set(os.environ.get("OAPROG_BENCH_TRAIN_STAGES", "ACD").upper())

    # ---- A: augmentation pipeline alone ----
    if "A" in stages:
        preproc_train = make_preprocess_fn(MODALS, MODEL_CFG["downscale"],
                                           train=True)

        @jax.jit
        def aug_chain(xs, key):
            def body(acc, i):
                out = preproc_train(xs, jax.random.fold_in(key, i))
                # reduce over EVERY output fully — a partial reduction
                # lets XLA slice through the gathers / DCE whole
                # modalities and report fantasy timings (cost us hours in
                # round 2)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
                return acc + s, None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(iters))
            return acc

        key = jax.random.key(0)
        np.asarray(aug_chain(xs, key)); np.asarray(aug_chain(xs, key))
        t0 = time.perf_counter()
        np.asarray(aug_chain(xs, key))
        t_aug = (time.perf_counter() - t0) / iters
        print(json.dumps({"stage": "A_augment+downscale",
                          "ms": round(t_aug * 1e3, 1)}), flush=True)

    # ---- C: full production train step ----
    # sequential dispatch (the production form): per-step RTT included,
    # exactly what the trainer pays per batch
    state2 = state
    n_steps = max(iters, 4)
    if "C" in stages:
        k = jax.random.key(1)
        state2, loss, _ = rt.train_step(state2, xs, ys, k)   # compile
        np.asarray(loss)
        state2, loss, _ = rt.train_step(state2, xs, ys, k)
        np.asarray(loss)
        t0 = time.perf_counter()
        for i in range(n_steps):
            state2, loss, _ = rt.train_step(state2, xs, ys,
                                            jax.random.fold_in(k, i))
            np.asarray(loss)
        t_step = (time.perf_counter() - t0) / n_steps
        print(json.dumps({"stage": "C_full_train_step_per_dispatch",
                          "ms": round(t_step * 1e3, 1),
                          "knees_per_sec": round(batch / t_step, 1)}),
              flush=True)

    # ---- D: k steps chained in ONE dispatch (training.steps_per_dispatch)
    # reuses the post-C state (a pristine copy cannot coexist with the
    # step's HBM footprint)
    if "D" in stages:
        k = 4
        xs_stack = tuple(jnp.stack([x] * k) for x in xs)
        ys_stack = jnp.stack([ys] * k)
        keys = jnp.stack([jax.random.fold_in(jax.random.key(2), i)
                          for i in range(k)])
        state3, losses = rt.train_steps(state2, xs_stack, ys_stack, keys)
        np.asarray(losses)
        state3, losses = rt.train_steps(state3, xs_stack, ys_stack, keys)
        np.asarray(losses)
        t0 = time.perf_counter()
        n_chunks = max(1, n_steps // k)
        for _ in range(n_chunks):
            state3, losses = rt.train_steps(state3, xs_stack, ys_stack,
                                            keys)
            np.asarray(losses)
        t_chunk = (time.perf_counter() - t0) / (n_chunks * k)
        print(json.dumps({"stage": f"D_train_steps_chained_k{k}",
                          "ms_per_step": round(t_chunk * 1e3, 1),
                          "knees_per_sec": round(batch / t_chunk, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
