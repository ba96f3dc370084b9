"""ResNet / ResNeXt feature extractors in flax (NHWC, bf16-capable).

Covers the encoder family the reference selects from its FE registry
(koafusion/models/_core_fes.py:6-15 → torchvision resnet18/34/50 and the
vendored resnext50_32x4d, `_torchvision.py:265-343`): ResNet v1 with
7x7 stem, BN, 3x3 max-pool, four stages, optional grouped 3x3 convs
(ResNeXt groups=32, width 4).

TPU-first choices:
  * NHWC layout end-to-end (TPU conv layout; the channel-first reference
    layout is transposed once at the model boundary),
  * a `dtype` knob so activations/convs run in bfloat16 on the MXU with
    float32 params and BN statistics,
  * torch semantics preserved where they are numerically visible: BN
    momentum 0.1 / eps 1e-5, asymmetric stem padding, stride placement on
    the 3x3 conv (torchvision v1.5 convention).

`convert_torch_resnet_state` imports torchvision-format checkpoints
(O,I,kh,kw → kh,kw,I,O etc.) so ImageNet initializations from the
reference's model-zoo URLs (`_torchvision.py:12-20`) can be reused when a
weights file is available locally.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ModuleDef = Any


# int8 post-training quantization (serving path): see ops/quant.py —
# measured on-chip the resnet50 3x3 convs at the slice-branch shapes
# speed up 1.2-2.0x (scripts/exp_int8.py), and int8 activation RESIDENCY
# (inter-op tensors materialized int8, dequant/BN/relu/requant fused into
# the conv epilogues) a further ~8% (scripts/exp_int8_residency.py).
# BN/relu/residual math runs in f32 inside the fusions; the parameter
# tree is unchanged, so checkpoints are oblivious. Activation scales live
# in `quant_acts` keyed by SITE (amax_in/amax_1/... at block scope).
from ..ops.quant import (QTensor, act_quant,  # noqa: E402
                         dequant, quant_conv_apply as _quant_conv_apply,
                         quantize_sym)


def _shape_of(x):
    return x.data.shape if isinstance(x, QTensor) else x.shape


def _max_pool_3x3s2(x):
    """3x3/s2 max pool, int8-resident aware (max commutes with the
    monotone quantization, so pooling the int8 data is exact)."""
    if isinstance(x, QTensor):
        d = jax.lax.reduce_window(
            x.data, jnp.asarray(-128, jnp.int8), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        return QTensor(d, x.scale)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class QConv(nn.Module):
    """Drop-in conv for the FE blocks: identical `kernel` param to
    nn.Conv(use_bias=False), plus the quantized execution modes (accepts
    an int8-resident QTensor input in serving mode)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, _shape_of(x)[-1], self.features),
                            jnp.float32)
        return _quant_conv_apply(self, x, kernel, self.strides, self.padding,
                                 1, self.dtype, self.quant)


class BasicBlock(nn.Module):
    filters: int
    stride: int
    conv: ModuleDef
    norm: ModuleDef
    groups: int = 1
    base_width: int = 64
    expansion: int = 1
    dense_groups: bool = True    # unused (no grouped convs in BasicBlock)
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        residual = x
        # explicit Conv_* names: identical tree whether self.conv is
        # nn.Conv (auto-named Conv_N) or QConv
        y = self.conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="Conv_0")(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = act_quant(self, y, "amax_1", self.quant)
        y = self.conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                      name="Conv_1")(y)
        y = self.norm(scale_init=nn.initializers.ones)(y)

        if _shape_of(residual) != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        out = nn.relu(y + dequant(residual, y.dtype))
        return act_quant(self, out, "amax_out", self.quant)


class _GroupedConv3x3(nn.Module):
    """Grouped 3x3 conv whose parameter keeps the grouped (kh, kw, Cin/G,
    Cout) layout but which COMPUTES as a block-diagonal dense conv.

    On the MXU a G=32 grouped conv runs each group as a 4-16-lane matmul —
    measured 6.2% MXU for resnext50 @350²/B16 vs 23.5% for an equal-FLOP
    dense resnet50 (BENCH_NOTES r2). Expanding the kernel to its
    block-diagonal dense equivalent is numerically identical (off-block
    zeros contribute nothing, and gradients project back onto the grouped
    parameter exactly), trades 32× FLOPs on these convs for ~4× better
    MXU mapping, and keeps checkpoints/interop byte-compatible."""

    features: int
    strides: tuple
    groups: int
    dense_groups: bool
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        cin = _shape_of(x)[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin // self.groups, self.features),
                            jnp.float32)
        k = kernel
        groups = self.groups
        if self.dense_groups and groups > 1:
            kh, kw, cing, cout = k.shape
            coutg = cout // groups
            t = k.reshape(kh, kw, cing, groups, coutg)
            eye = jnp.eye(groups, dtype=k.dtype)
            # dense[h, w, (j, i), (g, c)] = t[h, w, i, g, c] * (j == g)
            dense = jnp.einsum("hwigc,gj->hwjigc", t, eye)
            k = dense.reshape(kh, kw, groups * cing, cout)
            groups = 1
        return _quant_conv_apply(self, x, k, self.strides,
                                 [(1, 1), (1, 1)], groups, self.dtype,
                                 self.quant)


class Bottleneck(nn.Module):
    filters: int
    stride: int
    conv: ModuleDef
    norm: ModuleDef
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    dense_groups: bool = True
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        residual = x
        width = int(self.filters * (self.base_width / 64.0)) * self.groups

        y = self.conv(width, (1, 1), name="Conv_0")(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = act_quant(self, y, "amax_1", self.quant)
        # stride on the 3x3 (torchvision v1.5 placement); explicit Conv_*
        # names keep the parameter tree identical whichever branch runs
        if self.groups > 1:
            dt = self.conv.keywords.get("dtype", jnp.float32)
            y = _GroupedConv3x3(features=width,
                                strides=(self.stride, self.stride),
                                groups=self.groups,
                                dense_groups=self.dense_groups,
                                dtype=dt,
                                quant=self.quant,
                                name="Conv_1")(y)
        else:
            y = self.conv(width, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=((1, 1), (1, 1)), name="Conv_1")(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = act_quant(self, y, "amax_2", self.quant)
        y = self.conv(self.filters * self.expansion, (1, 1),
                      name="Conv_2")(y)
        y = self.norm()(y)

        if _shape_of(residual) != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        out = nn.relu(y + dequant(residual, y.dtype))
        return act_quant(self, out, "amax_out", self.quant)


class _StemConv(nn.Module):
    """7x7/2 RGB stem that accepts grayscale input directly.

    The kernel keeps the ImageNet-compatible (7, 7, 3, 64) shape; for a
    1-channel input the three input-channel slices are summed — numerically
    identical to the reference's gray→3-channel repeat (`_xr1_cnn.py:60`)
    but without materializing a 3x larger tensor in HBM."""

    features: int = 64
    dtype: Any = jnp.float32
    # space-to-depth form: pack 2x2 input pixels into channels and run the
    # (zero-padded-to-8x8) kernel as a 4x4 stride-1 conv — numerically
    # identical, larger contraction dim for the MXU
    space_to_depth: bool = False
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (7, 7, 3, self.features), jnp.float32)
        k = kernel
        cin = _shape_of(x)[-1]
        if cin == 1:
            k = jnp.sum(k, axis=2, keepdims=True)
        elif cin != 3:
            raise ValueError(f"Stem expects 1 or 3 channels, got "
                             f"{_shape_of(x)}")
        if self.quant and not self.space_to_depth:
            return _quant_conv_apply(self, x, k, (2, 2), [(3, 3), (3, 3)],
                                     1, self.dtype, self.quant)
        b, h, w, c = _shape_of(x)
        if self.space_to_depth and h % 2 == 0 and w % 2 == 0:
            # y[i,j] = Σ_{a,b} k[a,b]·xpad[2i+a, 2j+b] with pad 3; write
            # a = 2α+u, b = 2β+v → 4x4 conv over the 2x2-packed input with
            # kernel K[α,β,(u,v,c)] = k8[2α+u, 2β+v, c]
            def pack_x(xd):
                xp = jnp.pad(xd, ((0, 0), (3, 3), (3, 3), (0, 0)))
                hp, wp = h + 6, w + 6
                xs2d = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
                return xs2d.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hp // 2, wp // 2, 4 * c)

            k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
            k4 = k8.reshape(4, 2, 4, 2, c, self.features)
            k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
                4, 4, 4 * c, self.features)
            if isinstance(x, QTensor):
                # the repack is pure data movement and the zero pad is
                # exact under symmetric quantization (zero point 0), so
                # the int8 conv runs on the PACKED data — contraction dim
                # 4·4·4c vs the direct stem's 7·7·c, a better MXU mapping
                s_w = jnp.maximum(
                    jnp.max(jnp.abs(k4), axis=(0, 1, 2)), 1e-8) / 127.0
                y = jax.lax.conv_general_dilated(
                    pack_x(x.data), quantize_sym(k4, s_w), (1, 1),
                    [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return y.astype(jnp.float32) * (x.scale * s_w)
            return jax.lax.conv_general_dilated(
                pack_x(x.astype(self.dtype)), k4.astype(self.dtype), (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = dequant(x, self.dtype)
        return jax.lax.conv_general_dilated(
            x, k.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetFE(nn.Module):
    """ResNet feature extractor: (B, H, W, 1|3) → pooled (B, C) or maps
    (B, h, w, C), matching the reference's with_gap switch
    (koafusion/models/_mrN_cnn_trf.py:22-28)."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    groups: int = 1
    base_width: int = 64
    with_gap: bool = True
    dtype: Any = jnp.float32
    # rematerialize stages on backward: the per-slice CNN batch (B*S up to
    # ~1024 images) would otherwise keep every block activation live for
    # the gradient pass and overflow HBM at production batch sizes
    # (no-remat flagship batch-16 step needs 17.05G vs 15.75G HBM).
    # True = all stages; False = none; a sequence of 0-based stage indices
    # remats only those — e.g. (0, 1) keeps the 800M/400M stage1/2
    # activation giants out of HBM while sparing stages 3-4 the backward
    # recompute (config knob fe.remat / env OAPROG_FE_REMAT)
    remat: Any = True
    # stages rematerialized in CHUNKS of blocks instead of per stage
    # (overrides `remat` for those stages): whole-stage remat must hold
    # the stage's full intra-block working set during ITS backward replay
    # — at batch 32 stage1's replay alone overflows HBM; chunked replay
    # holds only `chunk` blocks' tensors at a time, storing one boundary
    # per chunk. Entries are stage indices (chunk 1 = per block) or
    # (stage, chunk) pairs (config: "Nb"/"NbK" entries in fe.remat, e.g.
    # ["0b", "1b2", 2, 3]; env OAPROG_FE_REMAT=0b,1b2,2,3). The memory
    # ladder per stage: per-block (stores every block input, smallest
    # working set) < chunked < whole-stage (stores one input, holds the
    # whole stage's working set on replay).
    remat_block_stages: Any = ()
    # rematerialize the stem unit (conv1+bn1+relu+maxpool) on backward,
    # recomputing from the (uint8-sized) input — drops the pre-pool relu
    # boundary the pool's backward otherwise pins (config: "s" entry in
    # fe.remat; env OAPROG_FE_REMAT=s,0b,1,2,3)
    remat_stem: bool = False
    # compute grouped 3x3s as block-diagonal dense convs (see
    # _GroupedConv3x3) — ~4x better MXU mapping for ResNeXt on TPU
    dense_groups: bool = True
    # space-to-depth stem (see _StemConv); numerics-identical
    s2d_stem: bool = False
    # int8 serving quantization: None | "calib" | "int8" (see
    # _quant_conv_apply). Eval-only; parameter tree is unchanged.
    quant: str | None = None
    # profiling aid: truncate the forward after "stem" or "stage<k>" —
    # apply() with the FULL variables dict still works (later params are
    # simply unused), letting per-stage timings be measured by prefix
    # differencing (scripts/bench_fe_stages.py). Never set in production.
    stop_after: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant and train:
            raise ValueError("quantized FEs are eval-only (quant=None to "
                             "train)")
        if self.quant:
            conv = partial(QConv, dtype=self.dtype, quant=self.quant)
            # int8 residency: conv epilogues emit f32 into the BN/relu/
            # requant fusion — keep the float math f32 (same fusion cost,
            # better precision than a bf16 round-trip)
            bn_dtype = jnp.float32
        else:
            conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32)
            bn_dtype = self.dtype
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=bn_dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = act_quant(self, x, "amax_in", self.quant)

        def run_stem(mdl, x):
            x = _StemConv(features=64, dtype=mdl.dtype,
                          space_to_depth=mdl.s2d_stem, quant=mdl.quant,
                          name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            # requant BEFORE the pool: max commutes with the monotone
            # quantization, so pooling int8 data is exact and reads 1B/elt
            x = act_quant(mdl, x, "amax_stem", mdl.quant)
            return _max_pool_3x3s2(x)

        # stem remat ("s" entry in fe.remat): the pool's backward keeps the
        # pre-pool relu alive (argmax routing) — a 1.56G boundary per FE at
        # the flagship batch-32 slice batch; replaying conv+bn+relu+pool
        # from the (uint8-sized) input removes it
        if self.remat_stem and not self.quant:
            x = nn.remat(run_stem)(self, x)
        else:
            x = run_stem(self, x)
        if self.stop_after == "stem":
            return jnp.mean(dequant(x, jnp.float32),
                            axis=(1, 2)).astype(self.dtype)

        def run_block(mdl, x, stage_idx, block_idx):
            stride = 2 if stage_idx > 0 and block_idx == 0 else 1
            return mdl.block_cls(
                filters=64 * 2 ** stage_idx,
                stride=stride,
                conv=conv,
                norm=norm,
                groups=mdl.groups,
                base_width=mdl.base_width,
                dense_groups=mdl.dense_groups,
                quant=mdl.quant,
                name=f"layer{stage_idx + 1}_{block_idx}",
            )(x)

        def run_stage(mdl, x, stage_idx, num_blocks):
            for block_idx in range(num_blocks):
                x = run_block(mdl, x, stage_idx, block_idx)
            return x

        def run_chunk(mdl, x, stage_idx, block_start, n_blocks):
            for block_idx in range(block_start, block_start + n_blocks):
                x = run_block(mdl, x, stage_idx, block_idx)
            return x

        # STAGE-granular rematerialization: only the stage boundaries
        # (plus the stem output) are saved for the backward pass — per-BLOCK
        # remat kept every block input alive and overflowed HBM at the
        # flagship's 1024-slice CNN batch (15.78/15.75G); whole-stage
        # recompute stores ~2.3G instead of ~5.4G of boundaries at the same
        # recompute cost (each op replayed once either way)
        block_set = {}   # stage_idx -> chunk size (1 = per block)
        for e in (self.remat_block_stages or ()):
            if isinstance(e, (tuple, list)):
                block_set[int(e[0])] = int(e[1])
            else:
                block_set[int(e)] = 1
        if (self.remat or block_set) and not self.quant:
            # quantized paths are eval-only: no backward pass to remat, and
            # the calib-mode quant_acts mutation composes more simply
            # outside the lifted transform
            run_stage_remat = nn.remat(run_stage, static_argnums=(2, 3))
            run_chunk_remat = nn.remat(run_chunk, static_argnums=(2, 3, 4))
        else:
            run_stage_remat = run_stage
            run_chunk_remat = run_chunk
        remat_stages = (self.remat if isinstance(self.remat, (tuple, list))
                        else None)
        for stage_idx, num_blocks in enumerate(self.stage_sizes):
            if stage_idx in block_set and not self.quant:
                chunk = block_set[stage_idx]
                for start in range(0, num_blocks, chunk):
                    x = run_chunk_remat(self, x, stage_idx, start,
                                        min(chunk, num_blocks - start))
                continue
            f = run_stage_remat if self.remat else run_stage
            if remat_stages is not None and stage_idx not in remat_stages:
                f = run_stage
            x = f(self, x, stage_idx, num_blocks)
            if self.stop_after == f"stage{stage_idx + 1}":
                return jnp.mean(dequant(x, jnp.float32),
                                axis=(1, 2)).astype(self.dtype)

        x = dequant(x, self.dtype)
        if self.with_gap:
            x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)


def resnet18(**kw):
    return ResNetFE(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw):
    return ResNetFE(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw):
    return ResNetFE(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, **kw)


def resnext50_32x4d(**kw):
    return ResNetFE(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                    groups=32, base_width=4, **kw)


FE_ARCHS = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnext50_32x4d": resnext50_32x4d,
}

FE_OUT_CHANNELS = {
    "resnet18": 512, "resnet34": 512, "resnet50": 2048,
    "resnext50_32x4d": 2048,
}

# the non-ResNet torchvision families the reference also registers
# (koafusion/models/_core_fes.py:6-15) live in models/encoders.py
from .encoders import (  # noqa: E402
    EXTRA_FE_ARCHS, EXTRA_FE_OUT_CHANNELS)

FE_ARCHS.update(EXTRA_FE_ARCHS)
FE_OUT_CHANNELS.update(EXTRA_FE_OUT_CHANNELS)

# archs whose feature maps are exactly stride-32 over the input — the only
# ones the static spatial-shape oracle (families.FE_SPATIAL) applies to;
# squeezenet1_0/inception_v3 use valid convs / ceil pools and must run
# with_gap=True (the reference raises on them in all trf consumers,
# _mrN_cnn_trf.py:97-102)
FE_STRIDE32 = {"resnet18", "resnet34", "resnet50", "resnext50_32x4d",
               "vgg16", "densenet161"}

# archs with the int8 serving-quantization path (fe.quant config knob)
QUANT_FE_ARCHS = {"resnet18", "resnet34", "resnet50", "resnext50_32x4d"}


# ---------------------------------------------------------------------------
# torchvision-format weight import
# ---------------------------------------------------------------------------

def _stage_sizes_from_torch(sd) -> list[int]:
    sizes = []
    for stage in range(1, 5):
        n = 0
        while any(k.startswith(f"layer{stage}.{n}.") for k in sd):
            n += 1
        sizes.append(n)
    return sizes


def convert_torch_resnet_state(sd: dict) -> tuple[dict, dict]:
    """torchvision ResNet state_dict → (flax params, batch_stats).

    Layout transposes: conv (O, I/g, kh, kw) → (kh, kw, I/g, O); BN
    weight/bias → scale/bias; running stats → batch_stats collection.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked") and not k.startswith("fc.")}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_w(v):
        return jnp.asarray(np.transpose(v, (2, 3, 1, 0)))

    put(params, ("conv1", "kernel"), conv_w(sd["conv1.weight"]))
    put(params, ("bn1", "scale"), jnp.asarray(sd["bn1.weight"]))
    put(params, ("bn1", "bias"), jnp.asarray(sd["bn1.bias"]))
    put(stats, ("bn1", "mean"), jnp.asarray(sd["bn1.running_mean"]))
    put(stats, ("bn1", "var"), jnp.asarray(sd["bn1.running_var"]))

    stage_sizes = _stage_sizes_from_torch(sd)
    is_bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if is_bottleneck else 2

    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            tpre = f"layer{stage}.{b}."
            fname = f"layer{stage}_{b}"
            # Convs/BNs are auto-named Conv_0..N / BatchNorm_0..N in flax
            for ci in range(n_convs):
                put(params, (fname, f"Conv_{ci}", "kernel"),
                    conv_w(sd[tpre + f"conv{ci + 1}.weight"]))
                put(params, (fname, f"BatchNorm_{ci}", "scale"),
                    jnp.asarray(sd[tpre + f"bn{ci + 1}.weight"]))
                put(params, (fname, f"BatchNorm_{ci}", "bias"),
                    jnp.asarray(sd[tpre + f"bn{ci + 1}.bias"]))
                put(stats, (fname, f"BatchNorm_{ci}", "mean"),
                    jnp.asarray(sd[tpre + f"bn{ci + 1}.running_mean"]))
                put(stats, (fname, f"BatchNorm_{ci}", "var"),
                    jnp.asarray(sd[tpre + f"bn{ci + 1}.running_var"]))
            if tpre + "downsample.0.weight" in sd:
                put(params, (fname, "downsample_conv", "kernel"),
                    conv_w(sd[tpre + "downsample.0.weight"]))
                put(params, (fname, "downsample_bn", "scale"),
                    jnp.asarray(sd[tpre + "downsample.1.weight"]))
                put(params, (fname, "downsample_bn", "bias"),
                    jnp.asarray(sd[tpre + "downsample.1.bias"]))
                put(stats, (fname, "downsample_bn", "mean"),
                    jnp.asarray(sd[tpre + "downsample.1.running_mean"]))
                put(stats, (fname, "downsample_bn", "var"),
                    jnp.asarray(sd[tpre + "downsample.1.running_var"]))
    return params, stats
