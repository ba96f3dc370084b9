"""Train state + optimizer registry (torch-semantics optax chains).

Optimizer registry mirrors koafusion/various/_optimizers.py:47-52
(SGD/Adam/AdamW/RMSprop) with torch update semantics:
  * Adam/SGD/RMSprop `weight_decay` is L2-to-gradient (coupled, applied
    before the moment updates) — torch's behavior, unlike optax.adamw;
  * AdamW uses decoupled decay.

The state is a flax struct holding params, BN statistics, optimizer state
and step; it is exactly what CheckpointHandler serializes, making resume
exact (params+opt+step+PRNG; SURVEY.md §5.3).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.schedules import make_lr_schedule


def _adam_torch(lr_schedule, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def _adamw_torch(lr_schedule, weight_decay=0.01, b1=0.9, b2=0.999, eps=1e-8):
    return optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)


def _sgd_torch(lr_schedule, weight_decay=0.0, momentum=0.0, nesterov=False):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def _rmsprop_torch(lr_schedule, weight_decay=0.0, decay=0.99, eps=1e-8,
                   momentum=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rms(decay=decay, eps=eps))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


dict_optimizers: dict[str, Callable] = {
    "SGD": _sgd_torch,
    "Adam": _adam_torch,
    "AdamW": _adamw_torch,
    "RMSprop": _rmsprop_torch,
}


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, config, rng, example_xs,
                       steps_per_epoch: int):
    """Init variables + optimizer from the `training` config subtree.

    Returns (state, tx, lr_schedule). `example_xs` are already-preprocessed
    device arrays matching the model forward signature.
    """
    variables = model.init(rng, *example_xs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    optim_cfg = config.training.optim
    sched_cfg = config.training.sched
    lr_schedule = make_lr_schedule(
        sched_cfg.name, dict(sched_cfg.params),
        lr_init=float(optim_cfg.lr_init), steps_per_epoch=steps_per_epoch)

    kwargs = {}
    wd = optim_cfg.get("weight_decay", 0.0)
    if wd:
        kwargs["weight_decay"] = float(wd)
    tx = dict_optimizers[optim_cfg.name](lr_schedule, **kwargs)
    opt_state = tx.init(params)

    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    return state, tx, lr_schedule


def state_to_serializable(state: TrainState) -> dict:
    """Pytree → plain nested structure for CheckpointHandler msgpack."""
    return jax.tree_util.tree_map(lambda x: x, {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })
