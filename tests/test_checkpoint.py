import numpy as np
import pytest

from oaprogressionmmf_tpu.utils.checkpoint import CheckpointHandler, load_ckpt


@pytest.fixture
def state():
    return {
        "params": {"dense": {"kernel": np.ones((4, 4), np.float32),
                             "bias": np.zeros((4,), np.float32)}},
        "opt_state": {"mu": np.full((4,), 0.5, np.float32)},
        "epoch": np.asarray(7),
    }


def test_save_load_roundtrip(tmp_path, state):
    h = CheckpointHandler(tmp_path)
    p = h.save_new_ckpt(state, model_name="XR1Cnn", fold_idx=0, epoch_idx=7)
    assert p.name == "XR1Cnn__fold_0__epoch_007.ckpt"
    restored = load_ckpt(p, target=state)
    np.testing.assert_array_equal(restored["params"]["dense"]["kernel"],
                                  state["params"]["dense"]["kernel"])
    assert int(restored["epoch"]) == 7


def test_rolling_retention(tmp_path, state):
    h = CheckpointHandler(tmp_path, num_saved=1)
    h.save_new_ckpt(state, model_name="M", fold_idx=1, epoch_idx=1)
    h.save_new_ckpt(state, model_name="M", fold_idx=1, epoch_idx=5)
    files = list(tmp_path.glob("*.ckpt"))
    assert len(files) == 1
    assert files[0].name == "M__fold_1__epoch_005.ckpt"
    assert h.get_last_ckpt() == files[0]


def test_get_last_ckpt_empty(tmp_path):
    h = CheckpointHandler(tmp_path)
    assert h.get_last_ckpt() is None


def test_existing_ckpts_discovered(tmp_path, state):
    h1 = CheckpointHandler(tmp_path)
    h1.save_new_ckpt(state, model_name="M", fold_idx=0, epoch_idx=3)
    h2 = CheckpointHandler(tmp_path)
    assert h2.get_last_ckpt().name == "M__fold_0__epoch_003.ckpt"


def test_missing_dir_raises(tmp_path):
    with pytest.raises(ValueError):
        CheckpointHandler(tmp_path / "nope")


def test_orbax_backend_roundtrip(tmp_path):
    """training.ckpt_backend=orbax: directory-per-epoch, rolling cleanup,
    exact restore into the target structure (SURVEY §5.4 hardening)."""
    import numpy as np
    from oaprogressionmmf_tpu.utils.checkpoint import (
        load_ckpt, make_checkpoint_handler)

    h = make_checkpoint_handler(tmp_path, backend="orbax")
    state = {"step": np.asarray(3, np.int32),
             "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "batch_stats": {},
             "opt_state": {"m": np.ones(4, np.float32)}}
    p1 = h.save_new_ckpt(state, model_name="XR1Cnn", fold_idx=0,
                         epoch_idx=1)
    assert p1.is_dir() and p1.name.endswith(".orbax")

    state2 = dict(state, step=np.asarray(5, np.int32))
    p2 = h.save_new_ckpt(state2, model_name="XR1Cnn", fold_idx=0,
                         epoch_idx=2)
    assert not p1.exists()          # rolling num_saved=1

    h2 = make_checkpoint_handler(tmp_path, backend="orbax")
    last = h2.get_last_ckpt()
    assert last == p2
    target = {"step": np.zeros((), np.int32),
              "params": {"w": np.zeros((2, 3), np.float32)},
              "batch_stats": {},
              "opt_state": {"m": np.zeros(4, np.float32)}}
    restored = load_ckpt(last, target=target)
    assert int(restored["step"]) == 5
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])


def test_orbax_restores_real_optax_opt_state(tmp_path):
    """Regression: orbax restore (no target) yields tuple nodes as plain
    lists; load_ckpt must convert them to index-keyed dicts before
    flax.from_state_dict, or restoring any real optax opt_state (tuple of
    namedtuples — e.g. dict_optimizers['Adam']) raises TypeError and
    orbax-backed training cannot resume."""
    import jax.numpy as jnp
    from oaprogressionmmf_tpu.train.state import (
        TrainState, dict_optimizers, state_to_serializable)
    from oaprogressionmmf_tpu.utils.checkpoint import (
        load_ckpt, make_checkpoint_handler)

    params = {"dense": {"kernel": jnp.ones((3, 2), jnp.float32),
                        "bias": jnp.zeros((2,), jnp.float32)}}
    tx = dict_optimizers["Adam"](lambda step: 1e-3, weight_decay=1e-4)
    state = TrainState(step=jnp.asarray(4, jnp.int32), params=params,
                       batch_stats={"bn": {"mean": jnp.ones(2)}},
                       opt_state=tx.init(params))
    payload = state_to_serializable(state)

    h = make_checkpoint_handler(tmp_path, backend="orbax")
    p = h.save_new_ckpt(payload, model_name="M", fold_idx=0, epoch_idx=4)

    import jax

    target = state_to_serializable(
        TrainState(step=jnp.asarray(0, jnp.int32),
                   params=jax.tree_util.tree_map(jnp.zeros_like, params),
                   batch_stats={"bn": {"mean": jnp.zeros(2)}},
                   opt_state=tx.init(params)))
    restored = load_ckpt(p, target=target)
    assert int(restored["step"]) == 4
    flat_a = jax.tree_util.tree_leaves(restored["opt_state"])
    flat_b = jax.tree_util.tree_leaves(payload["opt_state"])
    assert len(flat_a) == len(flat_b) and len(flat_a) > 0
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(restored["opt_state"])
            == jax.tree_util.tree_structure(target["opt_state"]))


def test_checkpoint_backend_factory_rejects_unknown(tmp_path):
    import pytest
    from oaprogressionmmf_tpu.utils.checkpoint import make_checkpoint_handler
    with pytest.raises(ValueError, match="backend"):
        make_checkpoint_handler(tmp_path, backend="nope")


def test_legacy_fused_qkv_migration(tmp_path):
    """Checkpoints from before the q/k/v unpacking (fused to_qkv kernel)
    restore into the current tree via a column split (load_ckpt
    migration)."""
    rng = np.random.RandomState(0)
    w = rng.rand(6, 18).astype(np.float32)
    legacy = {"params": {"agg": {"transformer": {"attn_0": {
        "to_qkv": {"kernel": w},
        "to_out": {"kernel": np.eye(6, dtype=np.float32)}}}}}}
    h = CheckpointHandler(tmp_path)
    p = h.save_new_ckpt(legacy, model_name="M", fold_idx=0, epoch_idx=1)

    target = {"params": {"agg": {"transformer": {"attn_0": {
        "to_q": {"kernel": np.zeros((6, 6), np.float32)},
        "to_k": {"kernel": np.zeros((6, 6), np.float32)},
        "to_v": {"kernel": np.zeros((6, 6), np.float32)},
        "to_out": {"kernel": np.zeros((6, 6), np.float32)}}}}}}
    restored = load_ckpt(p, target=target)
    attn = restored["params"]["agg"]["transformer"]["attn_0"]
    np.testing.assert_array_equal(attn["to_q"]["kernel"], w[:, :6])
    np.testing.assert_array_equal(attn["to_k"]["kernel"], w[:, 6:12])
    np.testing.assert_array_equal(attn["to_v"]["kernel"], w[:, 12:])
