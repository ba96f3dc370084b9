"""End-to-end HOST-FED eval throughput: disk → decode → device → forward.

Closes the gap between bench.py (device path with resident inputs) and the
BASELINE.md "end-to-end" wording: synthesizes a production-shaped prepared
tree on disk (uint8 gz NIfTI volumes + XR PNG), feeds the flagship eval
step through the real BatchLoader/GrainBatchLoader (decode threads,
prefetch, sharded device_put), and reports measured knees/s plus the
decode-core scaling model (this dev host has 1 core; production TPU-VM
hosts have tens).

Run: python scripts/bench_e2e_hostfed.py [n_knees] [batch] [backend]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oaprogressionmmf_tpu.ops.preproc import center_crop_np  # noqa: E402
from oaprogressionmmf_tpu.utils.formats import (  # noqa: E402
    nifti_to_numpy, numpy_to_nifti, numpy_to_png, png_to_numpy)

SHAPES = {"xr_pa": (700, 700), "sag_3d_dess": (320, 320, 128),
          "sag_t2_map": (320, 320, 25)}
CROPS = {"xr_pa": (700, 700), "sag_3d_dess": (320, 320, 128),
         "sag_t2_map": (320, 320, 25)}


def synth_tree(tmp: Path, n_knees: int) -> list[dict]:
    """Production-shaped files per knee; returns per-knee path records."""
    rng = np.random.RandomState(0)
    recs = []
    for i in range(n_knees):
        rec = {}
        for name, shape in SHAPES.items():
            if name == "xr_pa":
                img = (rng.rand(*shape) * 255).astype(np.uint8)
                p = tmp / f"k{i}_{name}.png"
                numpy_to_png(img, str(p))
            else:
                base = rng.rand(*[-(-s // 8) for s in shape]) \
                    .astype(np.float32)
                vol = np.kron(base, np.ones((8, 8, 8), np.float32))[
                    :shape[0], :shape[1], :shape[2]]
                vol = (vol * 200 + rng.rand(*shape) * 20).astype(np.uint8)
                p = tmp / f"k{i}_{name}.nii.gz"
                numpy_to_nifti(vol, str(p))
            rec[name] = p
        recs.append(rec)
    return recs


class _DiskKnees:
    """Minimal dataset with the BatchLoader .get contract: decode + crop
    (the host side of DatasetOAI3d.__getitem__) at production shapes."""

    def __init__(self, recs):
        self.recs = recs

    def __len__(self):
        return len(self.recs)

    def get(self, idx: int, epoch: int = 0) -> dict:
        rec = self.recs[idx]
        out = {"exam_knee_id": f"knee_{idx}",
               "target": np.asarray([idx % 2], np.int32)}
        for name, p in rec.items():
            if name == "xr_pa":
                img = png_to_numpy(str(p))
                out[f"image__{name}"] = img[None].astype(np.uint8)
            else:
                vol, _ = nifti_to_numpy(str(p), preserve_dtype=True)
                vol = center_crop_np(vol[None], CROPS[name])
                out[f"image__{name}"] = vol.astype(
                    np.uint8 if name == "sag_3d_dess" else np.float32)
        out["image__clin"] = np.zeros((1, 9), np.float32)
        return out


def main():
    n_knees = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    backend = sys.argv[3] if len(sys.argv) > 3 else "threads"

    import jax
    import jax.numpy as jnp

    from oaprogressionmmf_tpu.data.pipeline import (SequentialSampler,
                                                    make_batch_loader)
    from oaprogressionmmf_tpu.models import dict_models
    from oaprogressionmmf_tpu.parallel.mesh import create_mesh
    from oaprogressionmmf_tpu.train.trainer import make_preprocess_fn

    tmp = Path("/tmp/oaprog_e2e_bench")
    tmp.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    ds = _DiskKnees(synth_tree(tmp, n_knees))
    t_synth = time.perf_counter() - t0

    modals = ["xr_pa", "sag_3d_dess", "sag_t2_map", "clin"]
    downscale = [[0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 1.0], [1.0]]
    model_cfg = {
        "name": "XR1MR2C1CnnTrf",
        "input_size": [[700, 700], [320, 320, 128], [320, 320, 25], [16]],
        "downscale": downscale, "input_channels": 1, "output_channels": 2,
        "output_type": "dict", "debug": False, "restore_weights": False,
        "fe": {"xr": {"arch": "resnext50_32x4d", "pretrained": False,
                      "with_gap": True, "dropout": 0.0},
               "mr": {"arch": "resnet50", "pretrained": False,
                      "with_gap": True, "dropout": 0.0},
               "clin": {"dim_in": 9, "dim_out": 2048, "dropout": 0.1}},
        "agg": {"num_slices": [1, 64, 25, 1], "depth": 4, "heads": 8,
                "emb_dropout": 0.1, "mlp_dim": 2048, "mlp_dropout": 0.1},
    }
    model = dict_models["XR1MR2C1CnnTrf"](config=model_cfg,
                                          compute_dtype=jnp.bfloat16)
    preproc = make_preprocess_fn(modals, downscale, train=False)
    mesh = create_mesh(n_devices=1)

    loader = make_batch_loader(backend, ds, SequentialSampler(len(ds)),
                               batch, drop_last=False, pad_to_batch=True,
                               mesh=mesh, num_workers=4)

    @jax.jit
    def forward(variables, xs):
        out = model.apply(variables, *preproc(xs), train=False)
        return jax.nn.softmax(out["main"], axis=-1)

    # compile once on a first batch (excluded from timing)
    first = next(iter(loader.epoch(0)))
    xs0 = tuple(first[f"image__{m}"] for m in modals)
    variables = jax.jit(
        lambda xs: model.init(jax.random.key(0), *preproc(xs), train=False)
    )(xs0)
    np.asarray(forward(variables, xs0))

    # measured end-to-end epoch: loader decode (threads/processes) overlaps
    # the device steps via the prefetch queue
    t0 = time.perf_counter()
    n_done = 0
    probs = []
    for b in loader.epoch(1):
        xs = tuple(b[f"image__{m}"] for m in modals)
        probs.append(forward(variables, xs))
    for p in probs:
        np.asarray(p)           # materialize (tunnel: enqueue != done)
    dt = time.perf_counter() - t0
    n_done = n_knees

    host_cores = __import__("os").cpu_count()
    e2e = n_done / dt
    # decode-limited model: BENCH_NOTES r2 measured 4.8 knees/s/core for
    # dess+t2 decode; device path measured by bench.py
    print(json.dumps({
        "backend": backend, "n_knees": n_knees, "batch": batch,
        "host_cores": host_cores,
        "synth_sec": round(t_synth, 1),
        "e2e_knees_per_sec_measured": round(e2e, 2),
        "note": ("decode-bound on this host; device-path rate is bench.py's "
                 "number — cores_needed ~= device_rate / "
                 "knees_per_sec_per_core (scripts/bench_input_pipeline.py)"),
    }))


if __name__ == "__main__":
    main()
