"""Host input-pipeline decode-rate benchmark (no JAX).

Answers SURVEY §5.8 / TODO #4: can NIfTI-gzip decode feed the device at
production volume sizes? Synthesizes prepared-tree-like volumes (uint8,
gzip, production shapes), measures nifti_to_numpy + crop throughput, and
reports how many host cores a target knees/s requires.

Run: python scripts/bench_input_pipeline.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oaprogressionmmf_tpu.ops.preproc import center_crop_np  # noqa: E402
from oaprogressionmmf_tpu.utils.formats import (  # noqa: E402
    nifti_to_numpy, numpy_to_nifti)

SHAPES = {
    "sag_3d_dess": (320, 320, 128),
    "sag_t2_map": (320, 320, 25),
}


def main(tmp_dir="/tmp/oaprog_pipe_bench", n_files=6, iters=12):
    tmp = Path(tmp_dir)
    tmp.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    results = {}
    for name, shape in SHAPES.items():
        paths = []
        for i in range(n_files):
            # realistic content: smooth anatomy-ish field, compresses like
            # the prepared OAI volumes (not pure noise, not constant)
            base = rng.rand(*[-(-s // 8) for s in shape]).astype(np.float32)
            vol = np.kron(base, np.ones((8, 8, 8), np.float32))[
                :shape[0], :shape[1], :shape[2]]
            vol = (vol * 200 + rng.rand(*shape) * 20).astype(np.uint8)
            p = tmp / f"{name}_{i}.nii.gz"
            # write like the MRI prep does (ipr_to_ras) so the read-side
            # remap recovers (rows, cols, slices)
            numpy_to_nifti(vol, str(p), ipr_to_ras=True)
            paths.append(p)
        size_mb = sum(p.stat().st_size for p in paths) / n_files / 1e6

        t0 = time.perf_counter()
        for it in range(iters):
            # production dataset path: IPR remap (axis reversal — makes
            # the reader's F-order view C-contiguous for free) + crop,
            # materialized like the loader's batch assembly would
            vol, _spacings = nifti_to_numpy(str(paths[it % n_files]),
                                            ras_to_ipr=True,
                                            preserve_dtype=True)
            crop = np.ascontiguousarray(
                center_crop_np(vol[None], (shape[0] - 16, shape[1] - 16,
                                           shape[2])))
        dt = (time.perf_counter() - t0) / iters
        results[name] = {
            "file_mb": round(size_mb, 2),
            "decode_ms": round(dt * 1e3, 1),
            "vols_per_sec_per_core": round(1 / dt, 2),
        }

    # a knee = 1 dess + 1 t2 (+ tiny xr png, ignored here)
    sec_per_knee_core = sum(1e-3 * r["decode_ms"] for r in results.values())
    out = {
        "per_modality": results,
        "knees_per_sec_per_core": round(1 / sec_per_knee_core, 2),
        "cores_to_feed_200_knees_s": int(np.ceil(200 * sec_per_knee_core)),
        # flagship train step measured at 12.7 knees/s/chip (BENCH_NOTES)
        "cores_to_feed_train_12_7_knees_s_per_chip": int(
            np.ceil(12.7 * sec_per_knee_core)),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
