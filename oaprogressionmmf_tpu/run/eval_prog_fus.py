"""CLI: fusion-model evaluation/explanation —
`python -m oaprogressionmmf_tpu.run.eval_prog_fus`.

Same surface as koafusion/run/eval_prog_fus.py:515-531: regime `eval`
(fold-wise predictions + ensemble + metrics pickles) or `explain`
(modality-ablation utilization), plus profile={time,compute}.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from ..config import load_config
from ..utils.seeding import set_ultimate_seed

logger = logging.getLogger("eval_prog_fus")

CONF_DIR = Path(__file__).parent / "conf"


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = load_config(CONF_DIR / "prog_fus.yaml", argv)

    logging.basicConfig(level=logging.INFO)
    Path(config.path_logs).mkdir(exist_ok=True, parents=True)
    fh = logging.FileHandler(Path(
        config.path_logs, f"eval_prog_fus_{config.testing.folds.idx}.log"))
    fh.setLevel(logging.DEBUG)
    logging.getLogger().addHandler(fh)

    set_ultimate_seed()
    logger.info(config.to_yaml(resolve=True))

    import jax.numpy as jnp
    from ..parallel.dcn import initialize_distributed
    from ..train.evaluator import ProgressionEvaluator

    # multi-host: must run before any other jax call (no-op single-process)
    data_shard = initialize_distributed(config.get("runtime"))

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        config.get("runtime", {}).get("compute_dtype", "bfloat16")
        if hasattr(config.get("runtime", {}), "get") else "bfloat16"]

    evaluator = ProgressionEvaluator(config, compute_dtype=dtype,
                                     data_shard=data_shard)
    regime = config.testing.regime
    if regime == "eval":
        evaluator.eval()
    elif regime == "explain":
        evaluator.explain()
    else:
        raise ValueError(f"Unknown regime: {regime}")


if __name__ == "__main__":
    main()
