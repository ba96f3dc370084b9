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

import jax
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


def lambda_lr(lr_lambda, **kwargs):
    """torch LambdaLR: factor = lr_lambda(epoch). The callable must be
    jax-traceable (it receives a traced epoch index)."""
    return lambda epoch: jnp.asarray(lr_lambda(epoch), jnp.float32)


def multiplicative_lr(lr_lambda, **kwargs):
    """torch MultiplicativeLR: factor(E) = prod_{e=1..E} lr_lambda(e)."""
    def fn(epoch):
        return jax.lax.fori_loop(
            1, epoch + 1,
            lambda e, acc: acc * jnp.asarray(lr_lambda(e), jnp.float32),
            jnp.asarray(1.0, jnp.float32))
    return fn


def cosine_annealing_warm_restarts(T_0, T_mult=1, eta_min_factor=0.0,
                                   **kwargs):
    """torch CosineAnnealingWarmRestarts; eta_min given as a factor of
    lr_init (this registry's convention, cf. cosine_annealing_lr)."""
    T_0 = float(T_0)
    T_mult = int(T_mult)

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(e, T_0)
            t_i = T_0
        else:
            n = jnp.floor(jnp.log(e / T_0 * (T_mult - 1) + 1) /
                          math.log(T_mult))
            t_cur = e - T_0 * (T_mult ** n - 1) / (T_mult - 1)
            t_i = T_0 * T_mult ** n
        return (eta_min_factor + (1 - eta_min_factor) *
                (1 + jnp.cos(math.pi * t_cur / t_i)) / 2)
    return fn


def cyclic_lr(base_lr, max_lr, step_size_up=2000, step_size_down=None,
              mode="triangular", gamma=1.0, **kwargs):
    """torch CyclicLR (absolute LRs — lr_init is ignored, as in torch where
    base_lr/max_lr fully determine the cycle)."""
    up = float(step_size_up)
    down = float(step_size_down if step_size_down is not None
                 else step_size_up)
    total = up + down
    step_ratio = up / total

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        cycle = jnp.floor(1 + e / total)
        x = 1.0 + e / total - cycle
        scale_factor = jnp.where(x <= step_ratio, x / step_ratio,
                                 (x - 1) / (step_ratio - 1))
        height = (max_lr - base_lr) * scale_factor
        if mode == "triangular":
            scale = 1.0
        elif mode == "triangular2":
            scale = 1.0 / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            scale = gamma ** e          # scale_mode='iterations'
        else:
            raise ValueError(f"Unknown CyclicLR mode: {mode}")
        return base_lr + height * scale

    fn.absolute = True
    return fn


def one_cycle_lr(max_lr, total_steps, pct_start=0.3, anneal_strategy="cos",
                 div_factor=25.0, final_div_factor=1e4, three_phase=False,
                 **kwargs):
    """torch OneCycleLR (absolute LRs), annealed per scheduler step — the
    train loop steps schedulers once per epoch, so total_steps = epochs."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor

    if anneal_strategy == "cos":
        def anneal(start, end, pct):
            return end + (start - end) / 2.0 * (1 + jnp.cos(math.pi * pct))
    elif anneal_strategy == "linear":
        def anneal(start, end, pct):
            return (end - start) * pct + start
    else:
        raise ValueError(f"Unknown anneal_strategy: {anneal_strategy}")

    if three_phase:
        ends = [float(pct_start * total_steps) - 1,
                float(2 * pct_start * total_steps) - 2,
                total_steps - 1]
        lrs = [(initial_lr, max_lr), (max_lr, initial_lr),
               (initial_lr, min_lr)]
    else:
        ends = [float(pct_start * total_steps) - 1, total_steps - 1]
        lrs = [(initial_lr, max_lr), (max_lr, min_lr)]

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        lr = jnp.asarray(lrs[-1][1], jnp.float32)   # past the end: min_lr
        start_step = 0.0
        done = jnp.asarray(False)
        for end_step, (start_lr, end_lr) in zip(ends, lrs):
            span = max(end_step - start_step, 1e-12)
            pct = jnp.clip((e - start_step) / span, 0.0, 1.0)
            in_phase = jnp.logical_and(~done, e <= end_step)
            lr = jnp.where(in_phase, anneal(start_lr, end_lr, pct), lr)
            done = jnp.logical_or(done, in_phase)
            start_step = end_step
        return lr

    fn.absolute = True
    return fn


class ReduceLROnPlateau:
    """Metric-driven LR controller with torch semantics
    (torch.optim.lr_scheduler.ReduceLROnPlateau).

    Inherently host-side: call `step(metric)` once per epoch with the
    validation criterion; it returns the LR to use next. The trainer
    injects the returned value into the optimizer's hyperparams
    (optax.inject_hyperparams), keeping the train step jit-static.
    """

    def __init__(self, lr_init, mode="min", factor=0.1, patience=10,
                 threshold=1e-4, threshold_mode="rel", cooldown=0,
                 min_lr=0.0, eps=1e-8, **kwargs):
        if factor >= 1.0:
            raise ValueError("factor should be < 1.0")
        self.current_lr = float(lr_init)
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.min_lr = float(min_lr)
        self.eps = float(eps)
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, a, best):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def state_dict(self) -> dict:
        """Host-side controller state, checkpointed by the trainer so that
        resume does not silently reset a reduced LR (exact-resume
        guarantee, SURVEY §5.3)."""
        return {"current_lr": self.current_lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, state: dict) -> None:
        self.current_lr = float(state["current_lr"])
        self.best = float(state["best"])
        self.num_bad_epochs = int(state["num_bad_epochs"])
        self.cooldown_counter = int(state["cooldown_counter"])

    def step(self, metric) -> float:
        current = float(metric)
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.current_lr * self.factor, self.min_lr)
            if self.current_lr - new_lr > self.eps:
                self.current_lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.current_lr


dict_schedulers = {
    "LambdaLR": lambda_lr,
    "MultiplicativeLR": multiplicative_lr,
    "StepLR": step_lr,
    "MultiStepLR": multi_step_lr,
    "ExponentialLR": exponential_lr,
    "CosineAnnealingLR": cosine_annealing_lr,
    "ReduceLROnPlateau": ReduceLROnPlateau,
    "CyclicLR": cyclic_lr,
    "OneCycleLR": one_cycle_lr,
    "CosineAnnealingWarmRestarts": cosine_annealing_warm_restarts,
    "ConstantLR": constant_lr,
    "CustomWarmupStaticDecayLR": custom_warmup_static_decay,
    "CustomWarmupMultiStepLR": custom_warmup_multistep,
}


def make_lr_schedule(name: str, params: dict, lr_init: float,
                     steps_per_epoch: int):
    """Return an optax schedule step → lr, epoch-quantized like torch.

    CyclicLR/OneCycleLR define absolute LRs (lr_init ignored, torch
    semantics); ReduceLROnPlateau is metric-driven and cannot be a step
    schedule — the trainer wires it through optimizer hyperparams.
    """
    if name == "ReduceLROnPlateau":
        raise ValueError(
            "ReduceLROnPlateau is metric-driven; the trainer must drive it "
            "via ops.schedules.ReduceLROnPlateau + optax.inject_hyperparams")
    factor_fn = dict_schedulers[name](**dict(params))
    absolute = getattr(factor_fn, "absolute", False)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        value = factor_fn(epoch)
        return value if absolute else lr_init * value

    return schedule
