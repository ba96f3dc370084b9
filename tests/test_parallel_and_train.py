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
    # dp×tp is default-on since round 5 but guarded by a phase-1 wall-time
    # check; force it here so a slow CI host can't silently skip the phase
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
            assert "param equivalence ok" in out.stdout
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


def test_steps_per_dispatch_chunked_matches_per_step():
    """k-chunked training (lax.scan over stacked batches) matches per-step
    dispatch: bit-deterministic in itself, ulp-identical on the first step,
    and within reassociation-level drift afterwards (XLA compiles the scan
    body separately from the standalone step, so fusion choices differ at
    float epsilon and compound through Adam's rsqrt — measured ~5e-4 rel
    after 4 steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from oaprogressionmmf_tpu.config import config_from_dict
    from oaprogressionmmf_tpu.train.state import TrainState
    from oaprogressionmmf_tpu.train.trainer import _shared_runtime

    config = config_from_dict({
        "model": ge._dryrun_model_cfg(),
        "training": {
            "loss": {"name": "FocalLoss",
                     "params": {"reduction": "mean", "gamma": 2.0}},
            "optim": {"name": "Adam", "lr_init": 1e-4, "weight_decay": 1e-4},
            "sched": {"name": "CustomWarmupStaticDecayLR",
                      "params": {"epochs_warmup": 5, "epochs_static": 100,
                                 "epochs_decay": 1}},
        },
    })
    rt = _shared_runtime(config, tuple(ge._MODALS), None, steps_per_epoch=4,
                         compute_dtype=jnp.float32)
    n_steps, batch = 4, 4
    rng = np.random.RandomState(0)
    xs_all = [tuple(jnp.asarray(x) for x in ge._example_xs(
        batch, size=32, n_slices=2)) for _ in range(n_steps)]
    # distinct data per step
    xs_all = [tuple(x + 0.01 * i for x in xs) for i, xs in
              enumerate(xs_all)]
    ys_all = [jnp.asarray(rng.randint(0, 2, batch).astype(np.int32))
              for _ in range(n_steps)]
    keys = [jax.random.fold_in(jax.random.key(5), i)
            for i in range(n_steps)]

    def fresh_state():
        variables = rt.model.init(jax.random.key(0), *xs_all[0],
                                  train=False)
        return TrainState(step=jnp.asarray(0, jnp.int32),
                          params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=rt.tx.init(variables["params"]))

    s1 = fresh_state()
    losses_seq = []
    for i in range(n_steps):
        s1, loss, _ = rt.train_step(s1, xs_all[i], ys_all[i], keys[i])
        losses_seq.append(float(loss))

    s2 = fresh_state()
    xs_stack = tuple(jnp.stack([xs_all[i][m] for i in range(n_steps)])
                     for m in range(len(xs_all[0])))
    ys_stack = jnp.stack(ys_all)
    key_stack = jnp.stack(keys)
    s2, losses_chunk = rt.train_steps(s2, xs_stack, ys_stack, key_stack)

    # chunked path is bit-deterministic w.r.t. itself
    s3 = fresh_state()
    _, losses_chunk2 = rt.train_steps(s3, xs_stack, ys_stack, key_stack)
    np.testing.assert_array_equal(np.asarray(losses_chunk),
                                  np.asarray(losses_chunk2))

    # first step sees identical state: ulp-level agreement
    np.testing.assert_allclose(float(losses_chunk[0]), losses_seq[0],
                               rtol=1e-5)
    # later steps: compounding reassociation drift stays small
    np.testing.assert_allclose(np.asarray(losses_chunk),
                               np.asarray(losses_seq), rtol=5e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-4)


def test_dcn_initialize_and_host_shard(monkeypatch):
    """Multi-host entry point (parallel/dcn.py): config gating, kwarg
    plumbing into jax.distributed.initialize, and the loader shard derived
    from (process_index, process_count). Host logic only — this env is
    single-host, so initialize itself is monkeypatched."""
    import jax

    from oaprogressionmmf_tpu.config import config_from_dict
    from oaprogressionmmf_tpu.parallel import dcn

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))

    # disabled (default) and absent subtree: no init, identity shard
    assert dcn.initialize_distributed(None) == (0, 1)
    cfg = config_from_dict({"runtime": {"distributed": {"enable": False}}})
    assert dcn.initialize_distributed(cfg.runtime) == (0, 1)
    assert calls == []

    # enabled with explicit fields: kwargs forwarded with right types
    cfg = config_from_dict({"runtime": {"distributed": {
        "enable": True, "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4, "process_id": 2}}})
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert dcn.initialize_distributed(cfg.runtime) == (2, 4)
    assert calls == [{"coordinator_address": "10.0.0.1:8476",
                      "num_processes": 4, "process_id": 2}]

    # enabled with auto-resolution: no kwargs (TPU metadata / env vars)
    calls.clear()
    cfg = config_from_dict({"runtime": {"distributed": {"enable": True}}})
    dcn.initialize_distributed(cfg.runtime)
    assert calls == [{}]


def test_trainer_data_shard_reaches_loaders(monkeypatch, tmp_path):
    """ProgressionTrainer(data_shard=...) forwards shard_index/shard_count
    into every loader (train/val/test) — the per-host disjoint-slice
    contract of SURVEY.md §5.8. The spy aborts construction after the third
    loader so the test never pays a model compile."""
    from oaprogressionmmf_tpu.train.trainer import ProgressionTrainer
    from synth_oai import build_synth_tree, make_synth_config

    build_synth_tree(tmp_path / "data", n_patients=12, modals=("xr_pa",))
    config = make_synth_config(tmp_path, model_name="XR1Cnn",
                               modals=("xr_pa",))

    captured = []
    import oaprogressionmmf_tpu.data.pipeline as pipeline_mod
    real = pipeline_mod.make_batch_loader

    class _Done(Exception):
        pass

    def spy(backend, ds, sampler, batch_size, **kw):
        captured.append({k: kw.get(k) for k in ("shard_index",
                                                "shard_count")})
        if len(captured) == 3:
            raise _Done
        return real(backend, ds, sampler, batch_size, **kw)

    monkeypatch.setattr(pipeline_mod, "make_batch_loader", spy)
    with pytest.raises(_Done):
        ProgressionTrainer(config, fold_idx=0, data_shard=(1, 2))
    assert len(captured) == 3
    for kw in captured:
        assert kw == {"shard_index": 1, "shard_count": 2}
