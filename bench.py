"""Benchmark: flagship-model end-to-end inference throughput on TPU.

Measures knees/sec through the full device path of the flagship 4-modality
model (XR1MR2C1CnnTrf): device-side eval preprocessing (unit-range →
normalize) + last-chance downscale + bf16 forward — the same work the
reference times with `testing.profile=time` (koafusion/run/eval_prog_fus.py:
286-294), minus host IO.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / REF_BASELINE_KNEES_PER_SEC. The baseline is the
reference's single-GPU inference throughput for this model, grounded by
measurement + FLOP derivation in scripts/measure_ref_baseline.py (the repo
publishes no numbers): 430 GFLOP/knee at A100-class torch-eager efficiency
→ 25.6 knees/s (the generous bound; a V100 bound is ~12.8). See
BASELINE.md "Measured + derived reference throughput".
"""

import json
import time

import numpy as np

import os

REF_BASELINE_KNEES_PER_SEC = 25.6
BATCH = int(os.environ.get("OAPROG_BENCH_BATCH", 64))
N_WARMUP = int(os.environ.get("OAPROG_BENCH_WARMUP", 2))
N_ITERS = int(os.environ.get("OAPROG_BENCH_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.models import dict_models
    from oaprogressionmmf_tpu.train.trainer import make_preprocess_fn

    modals = ["xr_pa", "sag_3d_dess", "sag_t2_map", "clin"]
    model_cfg = {
        "name": "XR1MR2C1CnnTrf",
        "input_size": [[700, 700], [320, 320, 128], [320, 320, 25], [16]],
        "downscale": [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]],
        "input_channels": 1,
        "output_channels": 2,
        "output_type": "dict",
        "debug": False,
        "restore_weights": False,
        "fe": {
            "xr": {"arch": "resnext50_32x4d", "pretrained": False,
                   "with_gap": True, "dropout": 0.0},
            "mr": {"arch": "resnet50", "pretrained": False,
                   "with_gap": True, "dropout": 0.0},
            "clin": {"dim_in": 9, "dim_out": 2048, "dropout": 0.1},
        },
        "agg": {"num_slices": [1, 64, 25, 1], "depth": 4, "heads": 8,
                "emb_dropout": 0.1, "mlp_dim": 2048, "mlp_dropout": 0.1},
    }

    # int8 serving quantization (ops/quant.py): calibrate activation
    # scales on a small slice, then run the quantized graph.
    #   int8 (default) — quantized CNN FEs (the hot 95%; ~10 min compile)
    #   int8-all       — also the FeaT dense stacks (+~3 ms/batch but the
    #                    combined graph compiles pathologically slowly
    #                    through this env's remote compile service)
    #   none           — bf16 path
    quant = os.environ.get("OAPROG_BENCH_QUANT", "int8")
    if quant not in ("int8", "int8-all", "none", ""):
        raise SystemExit(
            f"OAPROG_BENCH_QUANT={quant!r}: use int8|int8-all|none")
    use_quant = quant.startswith("int8")
    if use_quant:
        for k in ("xr", "mr"):
            model_cfg["fe"][k] = dict(model_cfg["fe"][k], quant="int8")
        if quant == "int8-all":
            model_cfg["agg"] = dict(model_cfg["agg"], quant="int8")

    model = dict_models["XR1MR2C1CnnTrf"](config=model_cfg,
                                          compute_dtype=jnp.bfloat16)
    # fast=use_quant: the bf16-dot downscale joins the int8 serving regime
    preproc = make_preprocess_fn(modals, model_cfg["downscale"], train=False,
                                 fast=use_quant)

    rng = np.random.RandomState(0)
    # XR and DESS arrive as uint8 (the prepared trees store uint8 and the
    # host pipeline keeps them integer until device preproc — 4x less HBM
    # traffic on the raw volumes); T2 maps are float-valued
    xs_host = (
        (rng.rand(BATCH, 1, 700, 700) * 255).astype(np.uint8),
        (rng.rand(BATCH, 1, 320, 320, 128) * 255).astype(np.uint8),
        rng.rand(BATCH, 1, 320, 320, 25).astype(np.float32) * 0.1,
        rng.rand(BATCH, 1, 9).astype(np.float32),
    )
    xs = tuple(jnp.asarray(x) for x in xs_host)

    variables = jax.jit(
        lambda xs: model.init(jax.random.key(0), *preproc(xs), train=False)
    )(xs)

    if use_quant:
        # one calibration batch records per-conv activation amax into the
        # quant_acts collection (static scales: zero extra passes at
        # serving time)
        calib_cfg = dict(model_cfg,
                         fe={k: (dict(v, quant="calib")
                                 if isinstance(v, dict) and "arch" in v else v)
                             for k, v in model_cfg["fe"].items()})
        if quant == "int8-all":
            calib_cfg["agg"] = dict(model_cfg["agg"], quant="calib")
        calib_model = dict_models["XR1MR2C1CnnTrf"](
            config=calib_cfg, compute_dtype=jnp.bfloat16)

        @jax.jit
        def calibrate(variables, xs):
            _, muts = calib_model.apply(variables, *preproc(xs), train=False,
                                        mutable=["quant_acts"])
            return muts["quant_acts"]
        # small calibration slice: amax scales are batch-size-insensitive,
        # and the calib graph's |x| reductions pin full activations in
        # HBM (batch 128 calib OOMs by 6G)
        xs_cal = tuple(x[:min(16, BATCH)] for x in xs)
        variables = dict(variables,
                         quant_acts=calibrate(variables, xs_cal))

    def one_step(variables, xs, eps):
        # per-iteration input perturbation defeats CSE/hoisting of the
        # repeated forward inside the scan (for integer inputs an
        # alternating 0/1 offset; eps is i*1e-6)
        def perturb(x):
            if jnp.issubdtype(x.dtype, jnp.integer):
                return x + (eps * 1e6).astype(x.dtype) % 2
            return x + eps.astype(x.dtype)
        xs = tuple(perturb(x) for x in xs)
        out = model.apply(variables, *preproc(xs), train=False)
        return jax.nn.softmax(out["main"], axis=-1)

    @jax.jit
    def infer_chain(variables, xs):
        def body(acc, eps):
            return acc + one_step(variables, xs, eps), None
        acc, _ = jax.lax.scan(body, jnp.zeros((BATCH, 2)),
                              jnp.arange(N_ITERS, dtype=jnp.float32) * 1e-6)
        return acc

    # NOTE: materialize to host — through the remote-TPU tunnel,
    # block_until_ready returns at enqueue time, so device_get is the only
    # reliable completion barrier. N_ITERS steps run inside ONE dispatch
    # (lax.scan) so the tunnel round-trip is amortized away.
    for _ in range(N_WARMUP):
        np.asarray(infer_chain(variables, xs))

    t0 = time.perf_counter()
    np.asarray(infer_chain(variables, xs))
    dt = time.perf_counter() - t0

    knees_per_sec = BATCH * N_ITERS / dt
    print(json.dumps({
        "metric": "flagship_infer_knees_per_sec",
        "value": round(knees_per_sec, 2),
        "unit": "knees/sec/chip",
        "vs_baseline": round(knees_per_sec / REF_BASELINE_KNEES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
