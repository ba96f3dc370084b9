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
