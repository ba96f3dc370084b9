"""Learning-rate schedules as optax step-indexed schedules.

The reference drives torch LR schedulers once per epoch
(koafusion/various/_optimizers.py:4-67; stepped at
run/train_prog_fus.py:274-275). Here each schedule is a pure function of the
epoch index, lifted to an optax `Schedule` over update steps via
``epoch = step // steps_per_epoch`` so it can live inside the jitted train
step — no host-side scheduler object to step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def custom_warmup_static_decay(epochs_warmup, epochs_static, epochs_decay,
                               warmup_factor=0.1, decay_factor=0.9, **kwargs):
    """Linear warmup → plateau at 1 → exponential decay (reference parity)."""
    def fn(epoch):
        end_w = epochs_warmup
        end_s = end_w + epochs_static
        warm = warmup_factor + (1. - warmup_factor) * epoch / float(epochs_warmup)
        decay = decay_factor ** (epoch - end_s)
        return jnp.where(epoch <= end_w, warm,
                         jnp.where(epoch <= end_s, 1.0, decay))
    return fn


def custom_warmup_multistep(epochs_warmup, mstep_milestones,
                            warmup_factor=0.1, mstep_factor=0.1, **kwargs):
    """Linear warmup → multiplicative drops at warmup-shifted milestones."""
    milestones = jnp.asarray([epochs_warmup + e for e in mstep_milestones])

    def fn(epoch):
        warm = warmup_factor + (1. - warmup_factor) * epoch / float(epochs_warmup)
        n_passed = jnp.sum(epoch >= milestones)
        return jnp.where(epoch <= epochs_warmup, warm,
                         mstep_factor ** n_passed)
    return fn


def step_lr(step_size, gamma=0.1, **kwargs):
    return lambda epoch: gamma ** jnp.floor(epoch / step_size)


def multi_step_lr(milestones, gamma=0.1, **kwargs):
    ms = jnp.asarray(list(milestones))
    return lambda epoch: gamma ** jnp.sum(epoch >= ms)


def exponential_lr(gamma, **kwargs):
    return lambda epoch: gamma ** epoch


def cosine_annealing_lr(T_max, eta_min_factor=0.0, **kwargs):
    def fn(epoch):
        return (eta_min_factor + (1 - eta_min_factor) *
                (1 + jnp.cos(math.pi * epoch / T_max)) / 2)
    return fn


def constant_lr(**kwargs):
    return lambda epoch: jnp.asarray(1.0)


dict_schedulers = {
    "StepLR": step_lr,
    "MultiStepLR": multi_step_lr,
    "ExponentialLR": exponential_lr,
    "CosineAnnealingLR": cosine_annealing_lr,
    "ConstantLR": constant_lr,
    "CustomWarmupStaticDecayLR": custom_warmup_static_decay,
    "CustomWarmupMultiStepLR": custom_warmup_multistep,
}


def make_lr_schedule(name: str, params: dict, lr_init: float,
                     steps_per_epoch: int):
    """Return an optax schedule step → lr, epoch-quantized like torch."""
    factor_fn = dict_schedulers[name](**dict(params))

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr_init * factor_fn(epoch)

    return schedule
