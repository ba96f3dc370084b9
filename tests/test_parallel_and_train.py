"""Mesh sharding + jitted train-step tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oaprogressionmmf_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicate, shard_batch_pytree)


def test_mesh_has_8_virtual_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_pytree_places_batch_axis():
    mesh = create_mesh()
    batch = {"x": np.zeros((16, 4), np.float32),
             "y": np.zeros((16,), np.int32)}
    placed = shard_batch_pytree(mesh, batch)
    for v in placed.values():
        shards = v.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == 2  # 16 / 8


def test_data_parallel_train_step_matches_single_device():
    """Gradient all-reduce over the mesh must reproduce single-device math."""
    mesh = create_mesh()

    w = jnp.ones((4, 1), jnp.float32)
    x = np.random.RandomState(0).rand(16, 4).astype(np.float32)
    y = np.random.RandomState(1).rand(16, 1).astype(np.float32)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    grad_single = jax.grad(loss_fn)(w, jnp.asarray(x), jnp.asarray(y))

    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    ws = jax.device_put(w, replicate(mesh))
    grad_sharded = jax.jit(jax.grad(loss_fn))(ws, xs, ys)
    np.testing.assert_allclose(np.asarray(grad_sharded),
                               np.asarray(grad_single), rtol=1e-6)


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1), np.float32), 1.0,
                               atol=1e-2)


def test_graft_entry_multichip_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
