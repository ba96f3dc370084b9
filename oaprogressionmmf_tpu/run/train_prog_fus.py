"""CLI: fusion-model training — `python -m oaprogressionmmf_tpu.run.train_prog_fus`.

Same surface as the reference app (koafusion/run/train_prog_fus.py:335-362):
hydra-style overrides (`model=xr1_cnn data.target=prog_kl_48 ...`), per-fold
training with best-checkpoint selection, file logging under path_logs.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from ..config import load_config
from ..utils.seeding import set_ultimate_seed

logger = logging.getLogger("train_prog_fus")

CONF_DIR = Path(__file__).parent / "conf"


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = load_config(CONF_DIR / "prog_fus.yaml", argv)

    logging.basicConfig(level=logging.INFO)
    Path(config.path_logs).mkdir(exist_ok=True, parents=True)
    fh = logging.FileHandler(Path(
        config.path_logs,
        f"train_prog_fus_{config.training.folds.idx}.log"))
    fh.setLevel(logging.DEBUG)
    logging.getLogger().addHandler(fh)

    set_ultimate_seed()
    logger.info(config.to_yaml(resolve=True))

    if config.training.folds.idx == -1:
        fold_idcs = list(range(int(config.training.folds.num)))
    else:
        fold_idcs = [int(config.training.folds.idx)]
    ignore = config.training.folds.get("ignore")
    if ignore:
        fold_idcs = [i for i in fold_idcs if i not in ignore]

    import jax.numpy as jnp
    from ..parallel.dcn import initialize_distributed
    from ..parallel.mesh import create_mesh
    from ..train.trainer import ProgressionTrainer

    # multi-host: must run before any other jax call so the process joins
    # the global device set; single-process runs return (0, 1) untouched
    data_shard = initialize_distributed(config.get("runtime"))

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        config.get("runtime", {}).get("compute_dtype", "bfloat16")
        if hasattr(config.get("runtime", {}), "get") else "bfloat16"]
    n_dev = config.get("runtime", {}).get("n_devices")
    mesh = create_mesh(n_devices=int(n_dev) if n_dev else None)

    for fold_idx in fold_idcs:
        logger.info(f"Training fold {fold_idx}")
        trainer = ProgressionTrainer(config, fold_idx, mesh=mesh,
                                     compute_dtype=dtype,
                                     data_shard=data_shard)
        summary = trainer.fit()
        logger.info(f"Fold {fold_idx} summary: {summary}")


if __name__ == "__main__":
    main()
