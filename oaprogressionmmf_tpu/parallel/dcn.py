"""Multi-host (DCN) entry point: `jax.distributed.initialize` + host data
sharding.

The reference is strictly single-process (its only parallelism is
`nn.DataParallel`, koafusion/run/train_prog_fus.py:84). The TPU-native
scale-out path (SURVEY.md §5.8) runs ONE Python process per host of a
multi-host slice; `jax.distributed.initialize()` stitches the processes
into a single global device set, after which the same `Mesh` code in
`parallel.mesh` spans hosts — XLA routes intra-slice collectives over ICI
and cross-slice ones over DCN without user-code changes.

The host-side input pipeline must then feed each process a DISJOINT slice
of every epoch: this module derives the loader `shard_index/shard_count`
from `jax.process_index()/process_count()`. Loader `batch_size` stays the
PER-HOST batch (global batch = batch_size × process_count), matching
`grain.ShardOptions` semantics already implemented by both loader
backends (data/pipeline.py).

Config (run/conf/prog_fus.yaml `runtime.distributed`):

    runtime:
      distributed:
        enable: true
        coordinator_address: "10.0.0.1:8476"   # process 0; or env
        num_processes: 4                        # or env / TPU metadata
        process_id: 0                           # or env / TPU metadata

All three fields are optional — when omitted, `jax.distributed.initialize`
resolves them from the cluster environment (TPU metadata server, or the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).

This environment is single-host (one chip, one process), so multi-process
execution cannot run here; the host logic is unit-tested with patched
process indices (tests/test_parallel_and_train.py).
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(runtime_cfg) -> tuple[int, int]:
    """Initialize multi-host jax if configured; return the host data shard.

    Args:
        runtime_cfg: the `runtime` config subtree (mapping or None).

    Returns:
        (shard_index, shard_count) for the host input pipeline — equal to
        (jax.process_index(), jax.process_count()) after initialization.
        Single-process runs (the default, and this environment) return
        (0, 1) and never touch jax.distributed.
    """
    dist = None
    if runtime_cfg is not None and hasattr(runtime_cfg, "get"):
        dist = runtime_cfg.get("distributed")
    if dist is not None and hasattr(dist, "get") and dist.get("enable"):
        kwargs = {}
        for key in ("coordinator_address", "num_processes", "process_id"):
            val = dist.get(key)
            if val is not None:
                kwargs[key] = int(val) if key != "coordinator_address" \
                    else str(val)
        logger.info("jax.distributed.initialize(%s)", kwargs)
        jax.distributed.initialize(**kwargs)
    return data_shard_for_process()


def data_shard_for_process() -> tuple[int, int]:
    """(shard_index, shard_count) = (process_index, process_count).

    Valid whether or not jax.distributed was initialized (both are 0/1 in
    single-process mode). Each host's loaders then decode a disjoint
    contiguous slice of the epoch order (data/pipeline.py shard semantics
    on both the threads and grain backends).
    """
    return int(jax.process_index()), int(jax.process_count())
