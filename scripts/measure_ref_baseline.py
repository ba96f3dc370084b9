"""Measure the reference's flagship inference throughput on CPU torch and
derive the single-GPU baseline documented in BASELINE.md.

The reference repo publishes no perf numbers, so BASELINE.md's
knees/sec figure must be grounded: this script
  1. loads the reference's own flagship model class (XRNMRMCP from
     /root/reference, torchvision shimmed by its vendored copy — same
     mechanism as tests/test_reference_model_parity.py),
  2. times `model(*xs)` eval forwards at the production input sizes
     (the same work its `testing.profile=time` hook wraps,
     koafusion/run/eval_prog_fus.py:286-294),
  3. reports measured CPU knees/s + effective FLOP/s, and the FLOP-derived
     GPU bound: ref_gpu_knees_s = GPU_effective_FLOPs / FLOPs_per_knee.

Run: python scripts/measure_ref_baseline.py  (torch CPU only, no JAX)
"""

import importlib.util
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/koafusion")

# Flagship per-knee forward cost. Conv/linear MACs summed analytically:
#   DESS branch: 64 slices x resnet50 @160^2   (2.10 GMAC/slice -> 134 G)
#   T2 branch:   25 slices x resnet50 @160^2   (52 G)
#   XR branch:   1 image  x resnext50 @350^2   (10.3 G)
#   FeaT stack:  agg_1 64tok + agg_2 25tok + final 91tok, d=2048, 4 layers
#                each, ~25 MMAC/token/layer    (18 G)
# ~= 215 GMAC -> 430 GFLOP per knee (fused multiply-add = 2 FLOPs).
FLOPS_PER_KNEE = 430e9

# Effective GPU throughput for torch eager resnet-style fp32 inference on a
# datacenter GPU of the reference's era (V100/2080Ti class): fp32 peak
# ~14-16 TFLOP/s, eager-mode conv efficiency 30-45% -> ~5-6 TFLOP/s.
# (A100 TF32 eager would be ~2x that; both recorded below.)
GPU_EFFECTIVE_FLOPS = {"v100_fp32_eager": 5.5e12, "a100_tf32_eager": 11e12}


def _ref_module(dotted: str):
    full = f"refkoa.{dotted}"
    if full in sys.modules:
        return sys.modules[full]
    if "refkoa" not in sys.modules:
        pkg = types.ModuleType("refkoa")
        pkg.__path__ = [str(REF)]
        sys.modules["refkoa"] = pkg
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        sub = "refkoa." + ".".join(parts[:i])
        if sub not in sys.modules:
            mod = types.ModuleType(sub)
            mod.__path__ = [str(REF.joinpath(*parts[:i]))]
            sys.modules[sub] = mod
    spec = importlib.util.spec_from_file_location(
        full, REF.joinpath(*parts[:-1], parts[-1] + ".py"),
        submodule_search_locations=[])
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refkoa." + ".".join(parts[:-1])
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def build_reference_flagship():
    vendored = _ref_module("models._torchvision")

    class _TVModels:
        def __getattr__(self, name):
            return getattr(vendored, name, None)

    fake_tv = types.ModuleType("torchvision")
    fake_tv.models = _TVModels()
    sys.modules["torchvision"] = fake_tv

    xrNmrMcP = _ref_module("models._xrNmrMcP")

    class DotDict(dict):
        __getattr__ = dict.__getitem__

    config = DotDict({
        "debug": False,
        "output_type": "main",
        "output_channels": 2,
        "restore_weights": False,
        "input_size": [[700, 700], [320, 320, 128], [320, 320, 25], [16]],
        "downscale": [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]],
        "fe": {
            "xr": {"arch": "resnext50_32x4d", "pretrained": False,
                   "with_gap": True, "dropout": 0.1},
            "mr": {"arch": "resnet50", "pretrained": False,
                   "with_gap": True, "dropout": 0.1},
            "clin": {"dim_in": 9, "dim_out": 2048, "dropout": 0.1},
        },
        "agg": DotDict({"num_slices": [1, 64, 25, 1], "depth": 4,
                        "heads": 8, "emb_dropout": 0.1, "mlp_dim": 2048,
                        "mlp_dropout": 0.1}),
    })
    return xrNmrMcP.XR1MR2C1CnnTrf(config, path_weights=None).eval()


def main():
    import os
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    model = build_reference_flagship()

    # post-downscale shapes: the reference's profile hook times the forward
    # on already-downscaled device tensors (eval_prog_fus.py:278-294)
    rng = np.random.RandomState(0)
    xs = (
        torch.from_numpy(rng.rand(batch, 1, 350, 350).astype(np.float32)),
        torch.from_numpy(
            rng.rand(batch, 1, 160, 160, 64).astype(np.float32)),
        torch.from_numpy(
            rng.rand(batch, 1, 160, 160, 25).astype(np.float32)),
        torch.from_numpy(rng.rand(batch, 1, 9).astype(np.float32)),
    )

    with torch.inference_mode():
        model(*xs)                               # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(*xs)
        dt = (time.perf_counter() - t0) / iters

    cpu_knees_s = batch / dt
    cpu_eff_flops = FLOPS_PER_KNEE * cpu_knees_s
    out = {
        "cpu_threads": torch.get_num_threads(),
        "batch": batch,
        "sec_per_batch": round(dt, 3),
        "measured_cpu_knees_per_sec": round(cpu_knees_s, 3),
        "cpu_effective_tflops": round(cpu_eff_flops / 1e12, 3),
        "flops_per_knee_g": FLOPS_PER_KNEE / 1e9,
        "derived_gpu_knees_per_sec": {
            k: round(v / FLOPS_PER_KNEE, 2)
            for k, v in GPU_EFFECTIVE_FLOPS.items()},
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
