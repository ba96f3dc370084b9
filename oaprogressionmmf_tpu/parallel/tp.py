"""Tensor parallelism for the FeaT aggregator stacks (2-D dp×tp mesh).

The reference scales only by replicating the whole model
(nn.DataParallel). On TPU the FeaT blocks — the widest matmuls in every
*Trf family (d=2048, mlp 2048, qkv 6144) — shard Megatron-style over a
"model" mesh axis purely through parameter shardings; XLA's sharding
propagation then makes attention head-parallel and inserts the reduce
collectives over ICI (scaling-book recipe: annotate params, let the
compiler place collectives):

  * ``to_q``/``to_k``/``to_v`` kernels (d, d) → P(None, "model")
    (column-parallel: each model shard owns a contiguous group of heads —
    EXACT head parallelism; the kernels are unpacked precisely so this
    does not depend on GSPMD propagating through a packed (3, h, dh)
    reshape)
  * ``to_out`` kernel          (d, d)       → P("model", None)
    (row-parallel: consumes the head-sharded activations, psum output)
  * FeedForward Dense_0/Dense_1 (d→mlp→d)   → column / row parallel
  * mlp_head dense0/dense1                  → column / row parallel
  * everything else (CNN encoders, LN, pos-emb, CLS) replicated — the
    convolution branches are batch-parallel over the "data" axis.

`tp_param_specs` works on ANY of the model families (it pattern-matches
the FeaT submodule names wherever they appear: agg, agg_1/2, agg_final).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey


def _spec_for(path, leaf) -> P:
    names = [k.key if isinstance(k, DictKey) else str(k) for k in path]
    last = names[-1]
    joined = set(names)

    if joined & {"to_q", "to_k", "to_v", "to_qkv"} and last == "kernel":
        return P(None, "model")
    if "to_out" in joined:
        if last == "kernel":
            return P("model", None)
        return P()                       # bias spans the full output dim
    if any(n.startswith("ff_") for n in joined):
        if "Dense_0" in joined:
            return P(None, "model") if last == "kernel" else P("model")
        if "Dense_1" in joined:
            return P("model", None) if last == "kernel" else P()
    for n in joined:
        if n.startswith("mlp_head") and n.endswith("dense0"):
            return P(None, "model") if last == "kernel" else P("model")
        if n.startswith("mlp_head") and n.endswith("dense1"):
            return P("model", None) if last == "kernel" else P()
    return P()


def tp_param_specs(params):
    """Pytree of PartitionSpec matching `params` (FeaT tp, rest replicated)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params_tp(params, mesh: Mesh):
    """device_put `params` with the tp layout over `mesh` (axes
    ("data", "model")). Optimizer state initialized AFTER this call
    inherits the same shardings (computation follows data)."""
    specs = tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def create_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """(n_data × n_model) mesh with axes ("data", "model")."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"create_mesh_2d: {need} devices requested but only "
            f"{len(devices)} visible")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))
