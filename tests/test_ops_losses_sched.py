import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from oaprogressionmmf_tpu.ops import dict_losses, dict_schedulers


def _torch_focal(logits, targets, gamma=2.0, reduction="mean"):
    logpt = -TF.cross_entropy(torch.from_numpy(logits),
                              torch.from_numpy(targets), reduction="none")
    pt = torch.exp(logpt)
    loss = -((1 - pt) ** gamma) * logpt
    return (loss.mean() if reduction == "mean" else loss.sum()).item()


@pytest.mark.parametrize("reduction", ["mean", "sum"])
@pytest.mark.parametrize("gamma", [0.0, 2.0])
def test_focal_matches_torch(reduction, gamma):
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 2).astype(np.float32)
    targets = rng.randint(0, 2, 16).astype(np.int64)
    want = _torch_focal(logits, targets, gamma=gamma, reduction=reduction)
    loss_fn = dict_losses["FocalLoss"](num_classes=2, gamma=gamma,
                                       reduction=reduction)
    got = float(loss_fn(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_ce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(12, 2).astype(np.float32)
    targets = rng.randint(0, 2, 12).astype(np.int64)
    want = TF.cross_entropy(torch.from_numpy(logits),
                            torch.from_numpy(targets)).item()
    loss_fn = dict_losses["CrossEntropyLoss"](num_classes=2)
    got = float(loss_fn(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_focal_zero_gamma_equals_ce():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(8, 2).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 2, 8))
    f = dict_losses["FocalLoss"](num_classes=2, gamma=0.0)
    c = dict_losses["CrossEntropyLoss"](num_classes=2)
    np.testing.assert_allclose(float(f(logits, targets)),
                               float(c(logits, targets)), rtol=1e-6)


# ---------------------------------------------------------------------------
# schedules vs the reference LambdaLR formulas
# ---------------------------------------------------------------------------

def _torch_warmup_static_decay(epoch, epochs_warmup, epochs_static,
                               warmup_factor=0.1, decay_factor=0.9):
    end_w = epochs_warmup
    end_s = end_w + epochs_static
    if epoch <= end_w:
        return warmup_factor + (1. - warmup_factor) * epoch / float(epochs_warmup)
    elif end_w < epoch <= end_s:
        return 1.
    return decay_factor ** (epoch - end_s)


def test_custom_warmup_static_decay_parity():
    fn = dict_schedulers["CustomWarmupStaticDecayLR"](
        epochs_warmup=5, epochs_static=10, epochs_decay=1)
    for e in range(30):
        want = _torch_warmup_static_decay(e, 5, 10)
        np.testing.assert_allclose(float(fn(e)), want, rtol=1e-6)


def test_custom_warmup_multistep_parity():
    fn = dict_schedulers["CustomWarmupMultiStepLR"](
        epochs_warmup=5, mstep_milestones=[20, 40])
    for e in range(60):
        end_m = [5 + m for m in (20, 40)]
        if e <= 5:
            want = 0.1 + 0.9 * e / 5.0
        else:
            want = 0.1 ** sum(e >= m for m in end_m)
        np.testing.assert_allclose(float(fn(e)), want, rtol=1e-6)


def test_standard_schedules():
    step = dict_schedulers["StepLR"](step_size=10, gamma=0.1)
    assert float(step(9)) == 1.0 and abs(float(step(10)) - 0.1) < 1e-6
    ms = dict_schedulers["MultiStepLR"](milestones=[3, 6], gamma=0.5)
    assert float(ms(2)) == 1.0
    assert abs(float(ms(4)) - 0.5) < 1e-6
    assert abs(float(ms(7)) - 0.25) < 1e-6
    exp = dict_schedulers["ExponentialLR"](gamma=0.9)
    np.testing.assert_allclose(float(exp(3)), 0.9 ** 3, rtol=1e-6)
    cos = dict_schedulers["CosineAnnealingLR"](T_max=10)
    np.testing.assert_allclose(float(cos(0)), 1.0)
    np.testing.assert_allclose(float(cos(10)), 0.0, atol=1e-7)


def test_make_lr_schedule_step_quantization():
    from oaprogressionmmf_tpu.ops import make_lr_schedule
    sched = make_lr_schedule("CustomWarmupStaticDecayLR",
                             {"epochs_warmup": 5, "epochs_static": 100,
                              "epochs_decay": 1},
                             lr_init=1e-4, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 1e-5, rtol=1e-6)   # epoch 0
    np.testing.assert_allclose(float(sched(9)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-4 * 0.28, rtol=1e-6)


# ---------------------------------------------------------------------------
# torch-parity for the registry tail (various/_optimizers.py:55-67)
# ---------------------------------------------------------------------------

def _torch_lr_trace(sched_cls, lr_init, epochs, **kw):
    """LR at epochs 0..epochs-1 under a real torch scheduler."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr_init)
    sched = sched_cls(opt, **kw)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


def test_lambda_lr_matches_torch():
    want = _torch_lr_trace(torch.optim.lr_scheduler.LambdaLR, 0.1, 20,
                           lr_lambda=lambda e: 0.95 ** e)
    fn = dict_schedulers["LambdaLR"](lr_lambda=lambda e: 0.95 ** e)
    got = np.asarray([0.1 * float(fn(e)) for e in range(20)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multiplicative_lr_matches_torch():
    want = _torch_lr_trace(torch.optim.lr_scheduler.MultiplicativeLR,
                           0.1, 15, lr_lambda=lambda e: 0.9)
    fn = dict_schedulers["MultiplicativeLR"](lr_lambda=lambda e: 0.9)
    got = np.asarray([0.1 * float(fn(jnp.asarray(e))) for e in range(15)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("t_mult", [1, 2])
def test_cosine_warm_restarts_matches_torch(t_mult):
    want = _torch_lr_trace(
        torch.optim.lr_scheduler.CosineAnnealingWarmRestarts, 0.1, 30,
        T_0=5, T_mult=t_mult, eta_min=0.001)
    fn = dict_schedulers["CosineAnnealingWarmRestarts"](
        T_0=5, T_mult=t_mult, eta_min_factor=0.001 / 0.1)
    got = np.asarray([0.1 * float(fn(e)) for e in range(30)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("mode,gamma", [("triangular", 1.0),
                                        ("triangular2", 1.0),
                                        ("exp_range", 0.98)])
def test_cyclic_lr_matches_torch(mode, gamma):
    kw = dict(base_lr=0.001, max_lr=0.01, step_size_up=4, mode=mode,
              gamma=gamma)
    want = _torch_lr_trace(torch.optim.lr_scheduler.CyclicLR, 0.001, 25,
                           cycle_momentum=False, **kw)
    fn = dict_schedulers["CyclicLR"](**kw)
    got = np.asarray([float(fn(e)) for e in range(25)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("strategy,three_phase", [("cos", False),
                                                  ("linear", False),
                                                  ("cos", True)])
def test_one_cycle_lr_matches_torch(strategy, three_phase):
    kw = dict(max_lr=0.01, total_steps=20, pct_start=0.3,
              anneal_strategy=strategy, div_factor=25.0,
              final_div_factor=1e4, three_phase=three_phase)
    want = _torch_lr_trace(torch.optim.lr_scheduler.OneCycleLR, 0.01, 20,
                           cycle_momentum=False, **kw)
    fn = dict_schedulers["OneCycleLR"](**kw)
    got = np.asarray([float(fn(e)) for e in range(20)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_reduce_lr_on_plateau_matches_torch():
    from oaprogressionmmf_tpu.ops.schedules import ReduceLROnPlateau

    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.89, 0.89, 0.89, 0.89, 0.89,
               0.5, 0.5, 0.5, 0.5, 0.51, 0.52, 0.4]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, cooldown=1, min_lr=1e-3)
    ours = ReduceLROnPlateau(lr_init=0.1, mode="min", factor=0.5,
                             patience=2, cooldown=1, min_lr=1e-3)
    for m in metrics:
        tsched.step(m)
        got = ours.step(m)
        np.testing.assert_allclose(got, opt.param_groups[0]["lr"],
                                   rtol=1e-7)


def test_registry_matches_reference_scheduler_list():
    # koafusion/various/_optimizers.py:55-67 (+ConstantLR convenience)
    assert set(dict_schedulers) >= {
        "LambdaLR", "MultiplicativeLR", "StepLR", "MultiStepLR",
        "ExponentialLR", "CosineAnnealingLR", "ReduceLROnPlateau",
        "CyclicLR", "OneCycleLR", "CosineAnnealingWarmRestarts",
        "CustomWarmupStaticDecayLR", "CustomWarmupMultiStepLR"}


def test_plateau_trains_via_injected_hyperparams():
    """ReduceLROnPlateau end-to-end: the trainer injects the controller's
    LR into the optimizer hyperparams (optax.inject_hyperparams)."""
    import optax
    from oaprogressionmmf_tpu.train.state import dict_optimizers

    def factory(learning_rate):
        return dict_optimizers["SGD"](lambda _s: learning_rate)

    tx = optax.inject_hyperparams(factory)(learning_rate=0.1)
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0, 1.0])}
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.1, -0.1],
                               rtol=1e-6)
    state = state._replace(hyperparams={**state.hyperparams,
                                        "learning_rate":
                                        jnp.asarray(0.05, jnp.float32)})
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.05, -0.05],
                               rtol=1e-6)
