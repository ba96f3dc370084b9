"""Direct behavioral parity against the reference implementation.

These tests import modules of the read-only reference checkout at
/root/reference as ORACLES (no code is copied) and compare our
implementations' outputs bit-for-bit / within float tolerance. They are the
strongest parity evidence available without OAI data: fold membership,
metric values, transformer forward, losses, schedules, crops, and torch
transforms all come from running the reference's own code.

Skipped automatically when the reference checkout is absent.
"""

import importlib
import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/koafusion")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not available")


def _ref_module(dotted: str):
    """Import a reference submodule without triggering package __init__s
    (which need libraries absent here, e.g. nibabel)."""
    full = f"refkoa.{dotted}"
    if full in sys.modules:
        return sys.modules[full]
    if "refkoa" not in sys.modules:
        pkg = types.ModuleType("refkoa")
        pkg.__path__ = [str(REF)]
        sys.modules["refkoa"] = pkg
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        sub = "refkoa." + ".".join(parts[:i])
        if sub not in sys.modules:
            mod = types.ModuleType(sub)
            mod.__path__ = [str(REF.joinpath(*parts[:i]))]
            sys.modules[sub] = mod
    spec = importlib.util.spec_from_file_location(
        full, REF.joinpath(*parts[:-1], parts[-1] + ".py"),
        submodule_search_locations=[])
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refkoa." + ".".join(parts[:-1])
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# CV splits: fold membership must be IDENTICAL (checkpoint-parity keystone)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 7])
def test_stratified_group_kfold_identical_folds(seed):
    ref = _ref_module("various._stratified_group_kfold")
    from oaprogressionmmf_tpu.utils.splits import StratifiedGroupKFold

    rng = np.random.RandomState(3)
    n = 400
    groups = rng.randint(0, 120, n)
    y = (rng.rand(n) < 0.3).astype(int)
    X = np.zeros((n, 1))

    ours = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=seed)
    theirs = ref.StratifiedGroupKFold(n_splits=5, shuffle=True,
                                      random_state=seed)
    for (tr1, te1), (tr2, te2) in zip(ours.split(X, y, groups),
                                      theirs.split(X, y, groups)):
        np.testing.assert_array_equal(te1, te2)
        np.testing.assert_array_equal(tr1, tr2)


# ---------------------------------------------------------------------------
# Metric engine: identical values incl. bootstrap replay
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def preds():
    rng = np.random.RandomState(11)
    n = 300
    y = (rng.rand(n) < 0.25).astype(int)
    p = np.clip(0.3 * y + 0.5 * rng.rand(n), 0, 1)
    return y, np.stack([1 - p, p], axis=1)


def test_calibrated_ap_identical(preds):
    ref = _ref_module("various._metrics_wissam")
    from oaprogressionmmf_tpu.utils.metrics import (
        average_precision_score_calib, precision_recall_curve_calib)
    y, proba = preds
    want = ref.average_precision_score_calib(y, proba[:, 1], pi0=0.12)
    got = average_precision_score_calib(y, proba[:, 1], pi0=0.12)
    assert got == pytest.approx(want, abs=1e-12)
    pw, rw, tw = ref.precision_recall_curve_calib(y, proba[:, 1], pi0=0.12)
    po, ro, to = precision_recall_curve_calib(y, proba[:, 1], pi0=0.12)
    np.testing.assert_allclose(po, pw)
    np.testing.assert_allclose(ro, rw)
    np.testing.assert_allclose(to, tw)


def test_calc_metrics_v2_identical(preds):
    ref = _ref_module("various._metrics_stat_anlys")
    from oaprogressionmmf_tpu.utils.metrics import calc_metrics_v2
    y, proba = preds
    want = ref.calc_metrics_v2(prog_target=y, prog_pred_proba=proba,
                               target="prog_kl_48")
    got = calc_metrics_v2(y, proba, target="prog_kl_48")
    for k in ("sample_size", "num_pos", "num_neg", "prevalence", "roc_auc",
              "avg_precision", "avg_ppv_calib", "avg_npv", "cutoff",
              "youdens_index", "b_accuracy"):
        assert got[k] == pytest.approx(want[k], nan_ok=True), k


def test_bootstrap_replay_identical(preds):
    ref = _ref_module("various._metrics_stat_anlys")
    from oaprogressionmmf_tpu.utils.metrics import (calc_bootstrap,
                                                    roc_auc_score)
    y, proba = preds
    want = ref.calc_bootstrap(roc_auc_score, y, proba[:, 1], n_bootstrap=50,
                              seed=0, verbose=False)
    got = calc_bootstrap(roc_auc_score, y, proba[:, 1], n_bootstrap=50,
                         seed=0)
    np.testing.assert_allclose(got, want)


# ---------------------------------------------------------------------------
# FeaT: our flax weights exported into the REFERENCE torch module must
# produce the same outputs (validates both semantics and interop naming)
# ---------------------------------------------------------------------------

def test_feat_forward_identical_to_reference_module():
    import jax
    import jax.numpy as jnp
    import torch

    ref_trf = _ref_module("models._core_trf")
    from oaprogressionmmf_tpu.models import FeaT
    from oaprogressionmmf_tpu.utils.torch_interop import flax_feat_to_torch

    P, pd_, ed, depth, heads = 6, 16, 32, 2, 2
    model = FeaT(num_patches=P, patch_dim=pd_, emb_dim=ed, depth=depth,
                 heads=heads, mlp_dim=24, num_classes=2)
    feats = np.random.RandomState(0).randn(3, P, pd_).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        variables = model.init(jax.random.key(0), jnp.asarray(feats))
        out, states, _ = model.apply(variables, jnp.asarray(feats),
                                     deterministic=True)

    tm = ref_trf.FeaT(num_patches=P, patch_dim=pd_, emb_dim=ed, depth=depth,
                      heads=heads, mlp_dim=24, num_classes=2).eval()
    sd = {k: torch.from_numpy(np.asarray(v, np.float32).copy())
          for k, v in flax_feat_to_torch(
              jax.device_get(variables["params"]), "").items()}
    sd = {k.lstrip("."): v for k, v in sd.items()}
    tm.load_state_dict(sd)
    with torch.no_grad():
        want_out, want_states, _ = tm(torch.from_numpy(feats))
    np.testing.assert_allclose(np.asarray(out), want_out.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(states), want_states.numpy(),
                               atol=3e-4)


# ---------------------------------------------------------------------------
# Losses and schedules vs the reference's torch implementations
# ---------------------------------------------------------------------------

def test_focal_loss_identical():
    import jax.numpy as jnp
    import torch
    ref = _ref_module("various._losses")
    from oaprogressionmmf_tpu.ops.losses import dict_losses

    rng = np.random.RandomState(1)
    logits = rng.randn(32, 2).astype(np.float32)
    targets = rng.randint(0, 2, 32)
    want = ref.FocalLoss(num_classes=2, gamma=2)(
        input=torch.from_numpy(logits),
        target=torch.from_numpy(targets)).item()
    got = float(dict_losses["FocalLoss"](num_classes=2, gamma=2.0)(
        jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("name,params", [
    ("CustomWarmupStaticDecayLR", {"epochs_warmup": 5, "epochs_static": 10,
                                   "epochs_decay": 1}),
    ("CustomWarmupMultiStepLR", {"epochs_warmup": 5,
                                 "mstep_milestones": [20, 40]}),
])
def test_schedule_lrs_identical(name, params):
    import torch
    ref = _ref_module("various._optimizers")
    from oaprogressionmmf_tpu.ops.schedules import dict_schedulers

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-3)
    sched = getattr(ref, name)(opt, **params)
    fn = dict_schedulers[name](**params)
    for epoch in range(60):
        want = opt.param_groups[0]["lr"]  # lr used during `epoch`
        got = 1e-3 * float(fn(epoch))
        assert got == pytest.approx(want, rel=1e-6), epoch
        opt.step()
        sched.step()


# ---------------------------------------------------------------------------
# Preproc: crops and torch transforms vs the reference classes
# ---------------------------------------------------------------------------

def test_crops_identical():
    ref = _ref_module("preproc._np_nd")
    from oaprogressionmmf_tpu.ops.preproc import (center_crop_np,
                                                  random_crop_np)
    rng = np.random.RandomState(2)
    img = rng.rand(1, 30, 40)

    random.seed(123)
    rc = ref.RandomCrop(output_size=(16, 20), ndim=2)  # randomize() in init
    want = rc(img.copy())
    ratios = (rc.state["ratio_d0"], rc.state["ratio_d1"])
    got = random_crop_np(img, (16, 20), ratios)
    np.testing.assert_array_equal(got, want)

    cc = ref.CenterCrop(output_size=(16, 21), ndim=2)
    np.testing.assert_array_equal(center_crop_np(img, (16, 21)),
                                  cc(img.copy()))


def test_pt_transforms_identical():
    import jax.numpy as jnp
    import torch
    ref = _ref_module("preproc._pt")
    from oaprogressionmmf_tpu.ops.preproc import (normalize, to_unit_range)
    from oaprogressionmmf_tpu.ops.rotate import rotate2d

    rng = np.random.RandomState(3)
    img = rng.rand(1, 24, 28).astype(np.float32) * 200

    want = ref.PTToUnitRange()(torch.from_numpy(img)).numpy()
    np.testing.assert_allclose(np.asarray(to_unit_range(jnp.asarray(img))),
                               want, atol=1e-6)

    want = ref.PTNormalize(mean=[0.45], std=[0.29])(
        torch.from_numpy(img)).numpy()
    np.testing.assert_allclose(
        np.asarray(normalize(jnp.asarray(img), [0.45], [0.29])), want,
        atol=1e-3)

    rot = ref.PTRotate2D(degree_range=[-15.0, 15.0], prob=1.1)  # always on
    rot.state["p"] = 0.0
    rot.state["theta"] = torch.tensor(0.2)
    want = rot(torch.from_numpy(img)).numpy()
    got = np.asarray(rotate2d(jnp.asarray(img), jnp.float32(0.2)))
    # f32 grid-sample at intensity scale ~200 → ~4e-4 abs / 2e-5 rel noise
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pt_interpolate_identical():
    import jax.numpy as jnp
    import torch
    ref = _ref_module("preproc._pt")
    from oaprogressionmmf_tpu.ops.resize import interpolate

    rng = np.random.RandomState(4)
    x = rng.rand(2, 1, 21, 33).astype(np.float32)
    want = ref.PTInterpolate(scale_factor=(0.5, 0.5))(
        torch.from_numpy(x)).numpy()
    got = np.asarray(interpolate(jnp.asarray(x), (0.5, 0.5)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_gamma_correction_identical():
    import jax.numpy as jnp
    import torch
    ref = _ref_module("preproc._pt")
    from oaprogressionmmf_tpu.ops.preproc import gamma_correction

    rng = np.random.RandomState(5)
    img = rng.rand(1, 8, 8).astype(np.float32)
    g = ref.PTGammaCorrection(gamma_range=(0.5, 2.0), prob=1.1)
    g.state["p"] = 0.0
    g.state["gamma"] = 1.7
    want = g(torch.from_numpy(img)).numpy()
    got = np.asarray(gamma_correction(jnp.asarray(img), jnp.float32(1.7)))
    np.testing.assert_allclose(got, want, atol=1e-5)
