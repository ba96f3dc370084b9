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
import sys
import time

import numpy as np

import os

REF_BASELINE_KNEES_PER_SEC = 25.6
BATCH = int(os.environ.get("OAPROG_BENCH_BATCH", 64))
N_WARMUP = int(os.environ.get("OAPROG_BENCH_WARMUP", 2))
N_ITERS = int(os.environ.get("OAPROG_BENCH_ITERS", 10))
# calibration amax scales are an OFFLINE serving artifact (computed once,
# shipped with the model); the bench mirrors that by loading them from this
# file when present — regenerate with OAPROG_BENCH_CALIB=force after any
# change to the model architecture or the synthetic-weight recipe below
CALIB_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_calib_scales.npz")
# caches the flagship's parameter spec (path → shape/dtype): tracing
# model.init via eval_shape costs ~4 min of pure Python on this host's
# single core; the spec only changes when the architecture does
# (regenerate with OAPROG_BENCH_CALIB=force)
PARAM_SPEC_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_param_spec.json")

_t_last = time.perf_counter()


def _stage(name):
    """Stage timing to stderr (stdout carries only the JSON result line)."""
    global _t_last
    now = time.perf_counter()
    print(f"[bench] {name}: {now - _t_last:.1f}s", file=sys.stderr,
          flush=True)
    _t_last = now


def synth_variables(model, preproc, xs):
    """Host-side parameter synthesis (replaces the model.init compile).

    Serving never runs `init` — parameters arrive from a checkpoint. The
    bench mirrors that: shapes/dtypes come from jax.eval_shape (pure
    tracing, no XLA compile), values from a fixed host RNG with
    flax-conventional semantics (BN scale/var = 1, bias/mean = 0, kernels
    fan-in scaled). Values only need to be *plausible* — throughput is
    value-independent on TPU — but fan-in scaling keeps activations and
    calibration amaxes in a realistic range.
    """
    import jax

    spec = None
    if (os.path.exists(PARAM_SPEC_FILE)
            and os.environ.get("OAPROG_BENCH_CALIB") != "force"):
        with open(PARAM_SPEC_FILE) as f:
            spec = json.load(f)
    if spec is None:
        shapes = jax.eval_shape(
            lambda xs: model.init(jax.random.key(0), *preproc(xs),
                                  train=False), xs)
        flat, _ = jax.tree_util.tree_flatten_with_path(shapes)
        spec = []
        for path, leaf in flat:
            keys = [str(getattr(p, "key", getattr(p, "idx", "")))
                    for p in path]
            spec.append({"path": keys, "shape": list(leaf.shape),
                         "dtype": str(leaf.dtype)})
        with open(PARAM_SPEC_FILE, "w") as f:
            json.dump(spec, f)

    rng = np.random.RandomState(1234)
    tree = {}
    for entry in spec:
        keys, shape = entry["path"], tuple(entry["shape"])
        name = keys[-1] if keys else ""
        if name in ("scale", "var"):
            arr = np.ones(shape, np.float32)
        elif name in ("bias", "mean") or name.startswith("amax"):
            arr = np.zeros(shape, np.float32)
        elif len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            arr = rng.normal(0.0, 1.0 / np.sqrt(max(fan_in, 1)),
                             shape).astype(np.float32)
        else:
            # 1-D non-BN leaves (pos embeddings flattened, cls, …)
            arr = rng.normal(0.0, 0.02, shape).astype(np.float32)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[name] = arr.astype(np.dtype(entry["dtype"]))
    return tree


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
    #   int8-all (default) — int8 CNN FEs with activation residency + the
    #                        FeaT dense stacks: 284.3 knees/s (11.1x).
    #                        The pre-residency "pathological compile" is
    #                        gone (~55 s infer-chain compile).
    #   int8               — quantized CNN FEs only (277.2 knees/s)
    #   none               — bf16 path (204.8; best single-knee latency)
    quant = os.environ.get("OAPROG_BENCH_QUANT", "int8-all")
    if quant not in ("int8", "int8-all", "none", ""):
        raise SystemExit(
            f"OAPROG_BENCH_QUANT={quant!r}: use int8|int8-all|none")
    use_quant = quant.startswith("int8")
    if use_quant:
        # s2d stem adopted round 5: bit-identical int8 stem as a 4x4x4c
        # conv on the 2x2-packed input — measured 286.6 vs 284.9 knees/s
        # (OAPROG_S2D_STEM=0 reverts)
        for k in ("xr", "mr"):
            model_cfg["fe"][k] = dict(model_cfg["fe"][k], quant="int8",
                                      s2d_stem=True)
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
    # traffic on the raw volumes); T2 maps are float-valued. randint
    # draws uint8 directly — rng.rand would materialize ~8 GB of float64
    # first, which costs minutes on this 1-core host.
    xs_host = (
        rng.randint(0, 256, (BATCH, 1, 700, 700), dtype=np.uint8),
        rng.randint(0, 256, (BATCH, 1, 320, 320, 128), dtype=np.uint8),
        (rng.randint(0, 1000, (BATCH, 1, 320, 320, 25), dtype=np.int16)
         .astype(np.float32) * 1e-4),
        rng.rand(BATCH, 1, 9).astype(np.float32),
    )
    xs = tuple(jnp.asarray(x) for x in xs_host)
    _stage("input synthesis + transfer")

    # device_put once — leaving the tree as host numpy would re-ship
    # ~300 MB of params through the tunnel on EVERY infer_chain call
    variables = synth_variables(model, preproc, xs)
    if not use_quant:
        # the cached spec was traced with the quant model; the bf16 path
        # has no quant_acts collection
        variables.pop("quant_acts", None)
    variables = jax.device_put(variables)
    _stage("param synthesis (host) + transfer")

    if use_quant:
        # One calibration batch records per-conv activation amax into the
        # quant_acts collection (static scales: zero extra passes at
        # serving time). Calibration is an OFFLINE step in real serving,
        # so the resulting scalar amaxes are cached in CALIB_FILE and the
        # calib forward (a multi-minute remote compile here) is skipped
        # when the cache matches this quant mode.
        cache_key = f"amax__{quant}"
        cached = None
        if (os.path.exists(CALIB_FILE)
                and os.environ.get("OAPROG_BENCH_CALIB") != "force"):
            with np.load(CALIB_FILE) as z:
                if "key" in z and str(z["key"]) == cache_key:
                    cached = [np.float32(v) for v in z["amaxes"]]
        if cached is None:
            calib_cfg = dict(
                model_cfg,
                fe={k: (dict(v, quant="calib")
                        if isinstance(v, dict) and "arch" in v else v)
                    for k, v in model_cfg["fe"].items()})
            if quant == "int8-all":
                calib_cfg["agg"] = dict(model_cfg["agg"], quant="calib")
            calib_model = dict_models["XR1MR2C1CnnTrf"](
                config=calib_cfg, compute_dtype=jnp.bfloat16)

            @jax.jit
            def calibrate(variables, xs):
                _, muts = calib_model.apply(
                    variables, *preproc(xs), train=False,
                    mutable=["quant_acts"])
                return muts["quant_acts"]
            # small calibration slice: amax scales are batch-size-
            # insensitive, and the calib graph's |x| reductions pin full
            # activations in HBM (batch 128 calib OOMs by 6G)
            xs_cal = tuple(x[:min(16, BATCH)] for x in xs)
            quant_acts = jax.device_get(calibrate(variables, xs_cal))
            leaves, _ = jax.tree_util.tree_flatten(quant_acts)
            np.savez(CALIB_FILE, key=cache_key,
                     amaxes=np.asarray([float(v) for v in leaves],
                                       np.float32))
            variables = dict(variables,
                             quant_acts=jax.device_put(quant_acts))
            _stage("calibration (computed + cached)")
        else:
            # rebuild the quant_acts tree structure from the model's own
            # variable shapes, filling cached amax values in leaf order
            qa_shapes = variables.get("quant_acts")
            assert qa_shapes is not None, "quant model defines quant_acts"
            leaves, treedef = jax.tree_util.tree_flatten(qa_shapes)
            assert len(leaves) == len(cached), (
                f"calib cache has {len(cached)} amaxes, model wants "
                f"{len(leaves)}; rerun with OAPROG_BENCH_CALIB=force")
            variables = dict(variables, quant_acts=jax.device_put(
                jax.tree_util.tree_unflatten(treedef, cached)))
            _stage("calibration (cache hit)")

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
    _stage("infer_chain compile + warmup")

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
