"""Device-mesh utilities: batch data parallelism over ICI.

The reference's only device parallelism is single-process
`nn.DataParallel` (replicate + scatter/gather over PCIe,
koafusion/run/train_prog_fus.py:84). The TPU-native equivalent
(SURVEY.md §5.8) is one `jax.sharding.Mesh` over the slice:

  * params + optimizer state replicated (`NamedSharding(P())`),
  * batches sharded on the leading axis (`P("data")`),
  * the gradient all-reduce is inserted by XLA inside the jitted train
    step and rides ICI — no explicit collectives in user code.

`jax.distributed.initialize()` extends the same mesh across hosts (DCN)
without code changes; `create_mesh` just consumes whatever
`jax.devices()` reports.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis_name: str = "data",
                devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"create_mesh: {n_devices} devices requested but only "
                f"{len(devices)} visible. On CPU hosts set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} BEFORE the backend initializes.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays: shard dim 0 across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch, axis_name: str = "data"):
    """Place every array of a host batch with its batch axis sharded.

    This is the host→device boundary of the input pipeline: one
    `device_put` per array, laid out so each chip receives only its shard
    (replacing DataParallel's scatter; cf. SURVEY.md §5.8).
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def with_batch_constraint(x, mesh: Mesh, axis_name: str = "data"):
    """Annotate an intermediate as batch-sharded inside jit."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis_name)))
