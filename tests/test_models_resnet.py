"""ResNet encoder: torch-checkpoint import parity + shape contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from oaprogressionmmf_tpu.models.resnet import (
    ResNetFE, Bottleneck, BasicBlock, convert_torch_resnet_state,
    resnet50, resnext50_32x4d)


# ---------------------------------------------------------------------------
# Tiny torch oracle with torchvision-compatible parameter naming
# ---------------------------------------------------------------------------

class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride, groups, base_width):
        super().__init__()
        width = int(planes * base_width / 64.0) * groups
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if stride != 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = TF.relu(self.bn1(self.conv1(x)))
        y = TF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return TF.relu(y + idt)


class _TorchResNet(tnn.Module):
    def __init__(self, stage_sizes=(1, 1, 1, 1), groups=1, base_width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for s, n in enumerate(stage_sizes):
            blocks = []
            for b in range(n):
                stride = 2 if s > 0 and b == 0 else 1
                blocks.append(_TorchBottleneck(cin, 64 * 2 ** s, stride,
                                               groups, base_width))
                cin = 64 * 2 ** s * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = TF.relu(self.bn1(self.conv1(x)))
        x = TF.max_pool2d(x, 3, 2, 1)
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x.mean(dim=(2, 3))


@pytest.mark.parametrize("groups,base_width", [(1, 64), (2, 4)])
def test_torch_weight_import_parity(groups, base_width):
    torch.manual_seed(0)
    tm = _TorchResNet(stage_sizes=(1, 1, 1, 1), groups=groups,
                      base_width=base_width).eval()
    # randomize BN stats so running-stat import is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params, stats = convert_torch_resnet_state(tm.state_dict())
    fm = ResNetFE(stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck,
                  groups=groups, base_width=base_width, with_gap=True)
    with jax.default_matmul_precision("highest"):
        out = fm.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


def test_converted_tree_matches_init_structure():
    torch.manual_seed(1)
    tm = _TorchResNet(stage_sizes=(1, 1, 1, 1))
    params, stats = convert_torch_resnet_state(tm.state_dict())
    fm = ResNetFE(stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck)
    variables = fm.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)))

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k, v.shape))
        return out

    assert paths(variables["params"]) == paths(params)
    assert paths(variables["batch_stats"]) == paths(stats)


@pytest.mark.parametrize("size,expect", [(320, 10), (160, 5), (128, 4),
                                         (96, 3), (64, 2), (32, 1),
                                         (350, 11), (25, 1)])
def test_fe_spatial_oracle(size, expect):
    """The static shape table (SURVEY.md: _mrN_cnn_trf.py:55) must match the
    actual stride-32 encoder output."""
    fm = ResNetFE(stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock,
                  with_gap=False)
    variables = fm.init(jax.random.key(0), jnp.ones((1, size, size, 3)))
    out = fm.apply(variables, jnp.ones((1, size, size, 3)), train=False)
    assert out.shape[1] == expect and out.shape[2] == expect


def test_resnet50_output_channels():
    fm = resnet50(with_gap=True)
    variables = fm.init(jax.random.key(0), jnp.ones((1, 64, 64, 3)))
    out = fm.apply(variables, jnp.ones((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 2048)


def test_batch_stats_update_in_train_mode():
    fm = ResNetFE(stage_sizes=(1,), block_cls=BasicBlock)
    variables = fm.init(jax.random.key(0), jnp.ones((2, 32, 32, 3)))
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3),
                    jnp.float32)
    _, mutated = fm.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert np.abs(np.asarray(after - before)).max() > 0


def test_s2d_stem_is_numerically_identical():
    """Space-to-depth stem (ResNetFE.s2d_stem) computes the exact same
    convolution as the 7x7/s2 form (measured perf-neutral on v5e for the
    production shapes — BENCH_NOTES r2 — but exactness is guaranteed)."""
    from oaprogressionmmf_tpu.models.resnet import _StemConv

    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 1),
                    jnp.float32)
    m0 = _StemConv(space_to_depth=False)
    m1 = _StemConv(space_to_depth=True)
    variables = m0.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(m0.apply(variables, x)),
                               np.asarray(m1.apply(variables, x)),
                               atol=2e-5)

    # int8 + s2d: the repack commutes with symmetric quantization (zero
    # pad is exact at zero point 0) and the per-out-channel weight scales
    # are invariant to the zero-padded repack, so the int8 s2d stem is
    # BIT-identical to the direct int8 stem (int32 accumulation is exact)
    from oaprogressionmmf_tpu.ops.quant import QTensor, quantize_sym
    scale = jnp.float32(1.0 / 127.0)
    xq = QTensor(quantize_sym(x, scale), scale)
    q0 = _StemConv(space_to_depth=False, quant="int8")
    q1 = _StemConv(space_to_depth=True, quant="int8")
    np.testing.assert_array_equal(np.asarray(q0.apply(variables, xq)),
                                  np.asarray(q1.apply(variables, xq)))


def test_int8_quant_fe_matches_f32():
    """int8 serving path (fe.quant): identical parameter tree, calib
    records positive amax scales, quantized output tracks the f32 forward
    (per-channel weight + static activation scales)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32) * 2 - 1)

    fe = ResNetFE(stage_sizes=(1, 1), block_cls=Bottleneck, with_gap=True)
    v = fe.init(jax.random.key(0), x, train=False)
    ref = fe.apply(v, x, train=False)

    fe_cal = ResNetFE(stage_sizes=(1, 1), block_cls=Bottleneck,
                      with_gap=True, quant="calib")
    v_cal = fe_cal.init(jax.random.key(0), x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_cal["params"]))
    out, muts = fe_cal.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"],
         "quant_acts": v_cal["quant_acts"]}, x, train=False,
        mutable=["quant_acts"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)
    amax = jax.tree_util.tree_leaves(muts["quant_acts"])
    assert amax and all(float(a) > 0 for a in amax)

    fe_q = ResNetFE(stage_sizes=(1, 1), block_cls=Bottleneck,
                    with_gap=True, quant="int8")
    qout = fe_q.apply({"params": v["params"], "batch_stats": v["batch_stats"],
                       "quant_acts": muts["quant_acts"]}, x, train=False)
    r, q = np.asarray(ref).ravel(), np.asarray(qout).ravel()
    assert np.corrcoef(q, r)[0, 1] > 0.999

    # grouped (ResNeXt-style) and train-mode guard
    fe_g = ResNetFE(stage_sizes=(1,), block_cls=Bottleneck, groups=4,
                    base_width=16, with_gap=True, quant="int8")
    with pytest.raises(ValueError, match="eval-only"):
        fe_g.apply({"params": {}, "quant_acts": {}}, x, train=True)

    # percentile calibration ("calib:pNN.N", ops/quant.py::_calib_stat):
    # same quant_acts tree, every recorded scale <= the absmax one, and
    # the int8 graph consuming them still tracks the f32 forward
    fe_pct = ResNetFE(stage_sizes=(1, 1), block_cls=Bottleneck,
                      with_gap=True, quant="calib:p99.9")
    _, muts_pct = fe_pct.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"],
         "quant_acts": v_cal["quant_acts"]}, x, train=False,
        mutable=["quant_acts"])
    assert (jax.tree_util.tree_structure(muts_pct["quant_acts"])
            == jax.tree_util.tree_structure(muts["quant_acts"]))
    for a_pct, a_max in zip(jax.tree_util.tree_leaves(muts_pct["quant_acts"]),
                            jax.tree_util.tree_leaves(muts["quant_acts"])):
        assert 0 < float(a_pct) <= float(a_max) + 1e-6
    qout_pct = fe_q.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"],
         "quant_acts": muts_pct["quant_acts"]}, x, train=False)
    assert np.corrcoef(np.asarray(qout_pct).ravel(), r)[0, 1] > 0.999


def test_fe_remat_knob_parsing(monkeypatch):
    """fe.remat accepts bool or a stage-index list; OAPROG_FE_REMAT
    overrides with 0/1 or a comma list (families._make_fe)."""
    from oaprogressionmmf_tpu.models.families import _make_fe

    fe_cfg = {"arch": "resnet50", "pretrained": False}
    monkeypatch.delenv("OAPROG_FE_REMAT", raising=False)
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat is True  # default
    assert _make_fe(dict(fe_cfg, remat=False), True, None, "fe").remat \
        is False
    assert _make_fe(dict(fe_cfg, remat=[0, 1]), True, None, "fe").remat \
        == (0, 1)
    monkeypatch.setenv("OAPROG_FE_REMAT", "0,1")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat == (0, 1)
    monkeypatch.setenv("OAPROG_FE_REMAT", "0")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat is False
    monkeypatch.setenv("OAPROG_FE_REMAT", "1")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat is True
    # trailing comma disambiguates a single-stage LIST from the booleans
    monkeypatch.setenv("OAPROG_FE_REMAT", "1,")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat == (1,)
    monkeypatch.setenv("OAPROG_FE_REMAT", "0,")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat == (0,)

    # s2d stem knob: config fe.s2d_stem, env OAPROG_S2D_STEM overrides
    monkeypatch.delenv("OAPROG_FE_REMAT", raising=False)
    assert _make_fe(dict(fe_cfg), True, None, "fe").s2d_stem is False
    assert _make_fe(dict(fe_cfg, s2d_stem=True), True, None,
                    "fe").s2d_stem is True
    monkeypatch.setenv("OAPROG_S2D_STEM", "1")
    assert _make_fe(dict(fe_cfg), True, None, "fe").s2d_stem is True
    monkeypatch.setenv("OAPROG_S2D_STEM", "0")
    assert _make_fe(dict(fe_cfg, s2d_stem=True), True, None,
                    "fe").s2d_stem is False


def test_fe_remat_block_suffix_parsing(monkeypatch):
    from oaprogressionmmf_tpu.models.families import _make_fe

    fe_cfg = {"arch": "resnet50", "pretrained": False}
    monkeypatch.setenv("OAPROG_FE_REMAT", "0b,1,2,3")
    fe = _make_fe(dict(fe_cfg), True, None, "fe")
    assert fe.remat == (1, 2, 3) and fe.remat_block_stages == ((0, 1),)
    monkeypatch.delenv("OAPROG_FE_REMAT")
    fe2 = _make_fe(dict(fe_cfg, remat=["0b", "1b", 2, 3]), True, None, "fe")
    assert fe2.remat == (2, 3) and fe2.remat_block_stages == ((0, 1), (1, 1))
    # chunked block remat: "NbK" = stage N replayed K blocks at a time
    fe3 = _make_fe(dict(fe_cfg, remat=["0b", "1b2", 2, 3]), True, None, "fe")
    assert fe3.remat == (2, 3)
    assert fe3.remat_block_stages == ((0, 1), (1, 2))
    monkeypatch.setenv("OAPROG_FE_REMAT", "0b2,1b2,2,3")
    fe4 = _make_fe(dict(fe_cfg), True, None, "fe")
    assert fe4.remat_block_stages == ((0, 2), (1, 2))
    # "s" entry = stem remat
    monkeypatch.setenv("OAPROG_FE_REMAT", "s,0b,1,2,3")
    fe5 = _make_fe(dict(fe_cfg), True, None, "fe")
    assert fe5.remat_stem is True and fe5.remat == (1, 2, 3)
    assert fe5.remat_block_stages == ((0, 1),)
    monkeypatch.delenv("OAPROG_FE_REMAT")
    assert _make_fe(dict(fe_cfg), True, None, "fe").remat_stem is False


def test_fe_chunked_block_remat_matches_plain():
    """Chunked block remat is a pure memory/recompute trade: identical
    params and outputs vs the unrematted forward (resnet.py run_chunk)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
    fe_plain = ResNetFE(stage_sizes=(1, 3), block_cls=Bottleneck,
                        with_gap=True, remat=False)
    v = fe_plain.init(jax.random.key(1), x, train=False)
    ref = fe_plain.apply(v, x, train=False)
    fe_chunk = ResNetFE(stage_sizes=(1, 3), block_cls=Bottleneck,
                        with_gap=True, remat=(0,),
                        remat_block_stages=((1, 2),))
    v2 = fe_chunk.init(jax.random.key(1), x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    out = fe_chunk.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # and the gradient path compiles/executes through the lifted chunks
    def loss(params):
        return jnp.sum(fe_chunk.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=False) ** 2)
    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))

    # stem remat: same params/outputs, grads match the unrematted form
    fe_stem = ResNetFE(stage_sizes=(1, 3), block_cls=Bottleneck,
                       with_gap=True, remat=False, remat_stem=True)
    v3 = fe_stem.init(jax.random.key(1), x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v3["params"]))
    np.testing.assert_allclose(np.asarray(fe_stem.apply(v, x, train=False)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)

    def loss_stem(params):
        return jnp.sum(fe_stem.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=False) ** 2)
    g2 = jax.grad(loss_stem)(v["params"])
    def loss_plain(params):
        return jnp.sum(fe_plain.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=False) ** 2)
    g_ref = jax.grad(loss_plain)(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
