"""Mesh sharding + multichip dry-run, on an 8-virtual-device CPU mesh.

All device-mesh checks run in ONE subprocess with
--xla_force_host_platform_device_count=8: the environment's remote compile
service slows dramatically with virtual multi-device topologies, so the
main pytest process stays single-device (see conftest.py) and this file
pays the multi-device cost exactly once.
"""

import os
import subprocess
import sys

import pytest

_CHECK_SCRIPT = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
import jax.numpy as jnp

from oaprogressionmmf_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicate, shard_batch_pytree)

mesh = create_mesh()
assert mesh.devices.size == 8, mesh.devices

# 1. batch pytree placement: dim 0 sharded 8 ways
batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
placed = shard_batch_pytree(mesh, batch)
for v in placed.values():
    shards = v.addressable_shards
    assert len(shards) == 8, len(shards)
    assert shards[0].data.shape[0] == 2, shards[0].data.shape

# 2. data-parallel grad == single-device grad
w = jnp.ones((4, 1), jnp.float32)
x = np.random.RandomState(0).rand(16, 4).astype(np.float32)
y = np.random.RandomState(1).rand(16, 1).astype(np.float32)
loss_fn = lambda w, x, y: jnp.mean((x @ w - y) ** 2)
g1 = jax.grad(loss_fn)(w, jnp.asarray(x), jnp.asarray(y))
g8 = jax.jit(jax.grad(loss_fn))(
    jax.device_put(w, replicate(mesh)),
    jax.device_put(x, batch_sharding(mesh)),
    jax.device_put(y, batch_sharding(mesh)))
np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), rtol=1e-6)

# 3. full multichip training-step dry run (the driver's contract)
import __graft_entry__ as ge
ge.dryrun_multichip(8)
print("MESH_CHECKS_OK")
"""


def test_mesh_sharding_and_multichip_dryrun():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # the driver's default dryrun path is DP-only (time budget); the test
    # suite always exercises the dp×tp phase too
    env["OAPROG_DRYRUN_TP"] = "1"
    # the remote compile service occasionally drops a request — retry once
    last = None
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _CHECK_SCRIPT],
                env=env, cwd="/root/repo", capture_output=True, text=True,
                timeout=1500)
        except subprocess.TimeoutExpired as e:
            last = f"timeout; stdout so far:\n{e.stdout}\nstderr:\n{e.stderr}"
            continue
        if out.returncode == 0:
            assert "MESH_CHECKS_OK" in out.stdout
            assert "dryrun_multichip(8) ok" in out.stdout
            assert "dp×tp (2×4) ok" in out.stdout
            return
        last = f"rc={out.returncode}\nstdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    pytest.fail(f"mesh subprocess failed twice; last:\n{last}")


def test_graft_entry_single_chip():
    sys.path.insert(0, "/root/repo")
    import jax
    import numpy as np
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1), np.float32), 1.0,
                               atol=1e-2)


def test_tp_param_specs_rules():
    """FeaT kernels get column/row-parallel specs; everything else
    replicated (parallel/tp.py)."""
    from jax.sharding import PartitionSpec as P

    from oaprogressionmmf_tpu.parallel.tp import tp_param_specs

    params = {
        "agg": {"transformer": {
            "attn_0": {"to_q": {"kernel": 1}, "to_k": {"kernel": 1},
                       "to_v": {"kernel": 1},
                       "to_out": {"kernel": 1, "bias": 1}},
            "ff_0": {"Dense_0": {"kernel": 1, "bias": 1},
                     "Dense_1": {"kernel": 1, "bias": 1}},
        },
            "patch_to_embedding": {"kernel": 1, "bias": 1},
            "mlp_head0_dense0": {"kernel": 1, "bias": 1},
            "mlp_head0_dense1": {"kernel": 1, "bias": 1}},
        "fe": {"conv1": {"kernel": 1}},
    }
    specs = tp_param_specs(params)
    t = specs["agg"]["transformer"]
    for kk in ("to_q", "to_k", "to_v"):
        assert t["attn_0"][kk]["kernel"] == P(None, "model")
    assert t["attn_0"]["to_out"]["kernel"] == P("model", None)
    assert t["attn_0"]["to_out"]["bias"] == P()
    assert t["ff_0"]["Dense_0"]["kernel"] == P(None, "model")
    assert t["ff_0"]["Dense_0"]["bias"] == P("model")
    assert t["ff_0"]["Dense_1"]["kernel"] == P("model", None)
    assert specs["agg"]["mlp_head0_dense0"]["kernel"] == P(None, "model")
    assert specs["agg"]["mlp_head0_dense1"]["kernel"] == P("model", None)
    assert specs["agg"]["patch_to_embedding"]["kernel"] == P()
    assert specs["fe"]["conv1"]["kernel"] == P()
