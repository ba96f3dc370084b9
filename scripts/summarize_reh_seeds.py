"""Distribution-level parity summary for the multi-seed rehearsal runs.

Reads the reference-side 5-seed rows (rehearsal_r04_results.jsonl,
side=="ref") and the ours-side per-seed files
(rehearsal_r05_ours_s*.jsonl, written by scripts/run_reh_seeds.sh) and
prints the PARITY.md round-5 table: per-seed test AUROCs, means, sds,
and the mean-delta verdict against the 0.005 north star read inside the
combined seed noise.

Pure numpy — safe to run while a jax process owns the compile service.
"""

import glob
import json
import math
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def main():
    ref = {}
    for r in rows(ROOT / "rehearsal_r04_results.jsonl"):
        if r.get("side") == "ref":
            ref[r["seed"]] = r["test_auc_ref"]
    ours = {}
    # seed 0 from the round-4 matched run (side "both")
    for r in rows(ROOT / "rehearsal_r04_results.jsonl"):
        if r.get("side") == "both":
            ours[r["seed"]] = r["test_auc_ours"]
    for p in sorted(glob.glob(str(ROOT / "rehearsal_r05_ours_s*.jsonl"))):
        for r in rows(p):
            ours[r["seed"]] = r["test_auc_ours"]

    seeds = sorted(set(ref) & set(ours))
    rv = [ref[s] for s in seeds]
    ov = [ours[s] for s in seeds]

    def stats(v):
        m = sum(v) / len(v)
        sd = math.sqrt(sum((x - m) ** 2 for x in v) / (len(v) - 1))
        return m, sd

    rm, rsd = stats(rv)
    om, osd = stats(ov)
    delta = om - rm
    # sd of the difference of two 5-seed means (independent runs)
    sd_of_mean_delta = math.sqrt(rsd ** 2 / len(rv) + osd ** 2 / len(ov))

    print("| seed | " + " | ".join(str(s) for s in seeds)
          + " | mean | sd |")
    print("|---|" + "---|" * (len(seeds) + 2))
    print("| ref  test AUROC | " + " | ".join(f"{v:.4f}" for v in rv)
          + f" | **{rm:.4f}** | {rsd:.4f} |")
    print("| ours test AUROC | " + " | ".join(f"{v:.4f}" for v in ov)
          + f" | **{om:.4f}** | {osd:.4f} |")
    print()
    print(f"mean delta (ours - ref): {delta:+.4f}")
    print(f"sd of the mean delta (sqrt(sd_r^2/5 + sd_o^2/5)): "
          f"{sd_of_mean_delta:.4f}")
    print(f"|mean delta| <= 0.005 north star: "
          f"{'YES' if abs(delta) <= 0.005 else 'NO'}")
    print(f"|mean delta| inside 2x sd of the mean delta: "
          f"{'YES' if abs(delta) <= 2 * sd_of_mean_delta else 'NO'}")
    print()
    print(json.dumps({"seeds": seeds, "ref": rv, "ours": ov,
                      "ref_mean": round(rm, 4), "ref_sd": round(rsd, 4),
                      "ours_mean": round(om, 4), "ours_sd": round(osd, 4),
                      "mean_delta": round(delta, 4),
                      "sd_mean_delta": round(sd_of_mean_delta, 4)}))


if __name__ == "__main__":
    main()
