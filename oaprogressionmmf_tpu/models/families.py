"""The six progression-model families, re-designed as flax modules.

Functional parity with the reference registry
(koafusion/models/__init__.py:8-15): XR1Cnn, MR1CnnTrf, MR2CnnTrf,
XR1MR1CnnTrf, XR1MR2CnnTrf, XR1MR2C1CnnTrf. Constructor contract preserved
— each model is built from the `model` config subtree (same keys as the
reference's `run/conf/model/*.yaml`) and its forward returns logits or
{"main": logits} depending on `output_type`.

TPU-first redesign:
  * inputs keep the reference's channel-first external layout
    (B,CH,R,C[,S]) but are folded once to NHWC for the convs;
  * the per-slice trick — volume (B,1,R,C,S) → CNN batch (B·S,R,C,3) —
    is a pure reshape/transpose that XLA fuses away
    (cf. _mrN_cnn_trf.py:110-117);
  * all conv/attention math can run in bfloat16 (`compute_dtype`), params
    stay float32;
  * static shape resolution happens at construction from
    input_size × downscale, mirroring the reference's shape oracle tables
    (`_mrN_cnn_trf.py:55`, `_xr1mrN.py:64-65`).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .feat import FeaT
from .resnet import (FE_ARCHS, FE_OUT_CHANNELS, FE_STRIDE32,
                     QUANT_FE_ARCHS)

# FE output spatial size for the resnet-family stride-32 encoders, keyed by
# input size (the reference's static shape oracle, _mrN_cnn_trf.py:55 +
# _xr1mrN.py:64-65). Kept as documentation of the reference table;
# `_fe_spatial` computes the exact per-arch floor/ceil halving chain so
# archs with different padding/pooling (vgg16 floor-pools, densenet161
# avg-pool transitions) are sized correctly at every input.
FE_SPATIAL = {320: 10, 160: 5, 128: 4, 96: 3, 64: 2, 32: 1, 350: 11, 25: 1}


def _downscaled(size: Sequence[int], factor) -> list[int]:
    if not factor:
        return list(size)
    return [round(s * d) for s, d in zip(size, factor)]


def _ceil_half(s: int) -> int:
    # conv7/s2 pad3, maxpool3/s2 pad1, conv3/s2 pad1 all give ceil(s/2)
    return (s + 1) // 2


def _floor_half(s: int) -> int:
    # unpadded 2x2/s2 pooling gives floor(s/2)
    return s // 2


# 5-stage halving chains for the stride-32 encoders (resnet.FE_STRIDE32):
# resnet/resnext = all-ceil; vgg16 = five floor max-pools; densenet161 =
# conv+maxpool (ceil) then three 2x2/s2 avg-pool transitions (floor)
_FE_HALVING_CHAINS = {
    "vgg16": (_floor_half,) * 5,
    "densenet161": (_ceil_half, _ceil_half,
                    _floor_half, _floor_half, _floor_half),
}


def _fe_spatial(shape_in: Sequence[int], arch: str = "resnet50"
                ) -> tuple[int, ...]:
    """Static FE-map spatial oracle. Raises loudly — never guesses — for
    collapsing input sizes or non-stride-32 encoders (the reference raises
    equivalently, _mrN_cnn_trf.py:97-102,196-200)."""
    if arch not in FE_STRIDE32:
        raise ValueError(
            f"`model.fe.arch`={arch!r} requires `model.fe.with_gap=true` "
            f"(non-stride-32 feature maps)")
    chain = _FE_HALVING_CHAINS.get(arch, (_ceil_half,) * 5)
    out = []
    for e in shape_in:
        s = int(e)
        for halve in chain:
            s = halve(s)
        if s < 1:
            raise ValueError(
                f"`model.fe.arch`={arch!r} collapses input extent {int(e)} "
                f"to a zero-size feature map; increase `model.input_size` "
                f"or use `model.fe.with_gap=true`")
        out.append(s)
    return tuple(out)


def _make_fe(fe_cfg: dict, with_gap: bool, dtype, name: str):
    """FE factory honoring the optional `fe.quant` serving knob
    (int8 post-training quantization, models/resnet.py) on the archs that
    support it; other archs ignore it. `fe.remat` (default true) selects
    stage-granular rematerialization in the ResNet FEs — with uint8 host
    inputs and post-downscale augmentation the flagship step fits HBM
    without it at batch 16, trading memory back for backward-pass speed
    (env override OAPROG_FE_REMAT=0/1 for experiments)."""
    import os

    kwargs = {"with_gap": with_gap, "dtype": dtype, "name": name}
    quant = fe_cfg.get("quant")
    if quant and fe_cfg["arch"] in QUANT_FE_ARCHS:
        kwargs["quant"] = quant
    # space-to-depth stem (numerics-identical, float AND int8 paths):
    # config fe.s2d_stem or env OAPROG_S2D_STEM=1 (bench experiments)
    s2d = fe_cfg.get("s2d_stem")
    env_s2d = os.environ.get("OAPROG_S2D_STEM")
    if env_s2d is not None:
        s2d = env_s2d not in ("0", "")
    if s2d is not None and fe_cfg["arch"] in QUANT_FE_ARCHS:
        kwargs["s2d_stem"] = bool(s2d)
    remat = fe_cfg.get("remat")
    env = os.environ.get("OAPROG_FE_REMAT")
    if env is not None:
        # "0"/"1" (booleans), or a comma list of stage entries: "0,1" =
        # stage-remat stages 1-2 only; a "b" suffix ("0b,1,2,3") selects
        # PER-BLOCK remat for that stage and "bK" ("1b2") remat in chunks
        # of K blocks (ResNetFE.remat_block_stages). A single-stage LIST
        # needs a trailing comma to disambiguate from the booleans: "1,"
        # remats only stage 1
        entries = [s.strip() for s in env.split(",") if s.strip()]
        if ("," in env or len(entries) > 1
                or (entries and entries[0] not in ("0", "1"))):
            remat = entries
        else:
            remat = env not in ("0", "")
    if remat is not None and fe_cfg["arch"] in QUANT_FE_ARCHS:
        if isinstance(remat, (tuple, list)):
            import re
            stage_idxs, block_idxs = [], []
            for e in remat:
                s = str(e)
                if s == "s":            # stem remat
                    kwargs["remat_stem"] = True
                    continue
                m = re.fullmatch(r"(\d+)b(\d*)", s)
                if m:
                    block_idxs.append((int(m.group(1)),
                                       int(m.group(2) or 1)))
                else:
                    stage_idxs.append(int(s))
            kwargs["remat"] = tuple(stage_idxs)
            kwargs["remat_block_stages"] = tuple(block_idxs)
        else:
            kwargs["remat"] = bool(remat)
    return FE_ARCHS[fe_cfg["arch"]](**kwargs)


def _fold_volume_to_slices(x: jnp.ndarray, dims_view: str = "rc"):
    """(B, 1, R, C, S) channel-first volume → (B·S', H, W, 3) NHWC batch.

    dims_view selects the slicing plane as in _mrN_cnn_trf.py:61-71:
    'rc' slices along S, 'cs' along R, 'rs' along C.
    """
    b = x.shape[0]
    if dims_view == "rc":
        t = jnp.transpose(x, (0, 4, 2, 3, 1))   # (B, S, R, C, 1)
    elif dims_view == "cs":
        t = jnp.transpose(x, (0, 2, 3, 4, 1))   # (B, R, C, S, 1)
    elif dims_view == "rs":
        t = jnp.transpose(x, (0, 3, 2, 4, 1))   # (B, C, R, S, 1)
    else:
        raise ValueError("Unsupported `model.fe.dims_view`")
    n_slices = t.shape[1]
    t = t.reshape((b * n_slices,) + t.shape[2:])
    # grayscale stays 1-channel: the FE stem folds the RGB kernel
    return t, n_slices


def _image_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, R, C) → (B, R, C, 1); the FE stem folds the RGB kernel."""
    return jnp.transpose(x, (0, 2, 3, 1))


def _axis_token_count(shape_in: Sequence[int], spat: Sequence[int],
                      dims_view: str) -> int:
    """Token-sequence length for a volume sliced along `dims_view`:
    slice-axis length × FE-map area of the viewed plane
    (cf. _mrN_cnn_trf.py:60-71)."""
    if dims_view == "rc":
        return shape_in[2] * spat[0] * spat[1]
    if dims_view == "cs":
        return shape_in[0] * spat[1] * spat[2]
    if dims_view == "rs":
        return shape_in[1] * spat[0] * spat[2]
    raise ValueError("Unsupported `model.fe.dims_view`")


def _tokens_from_maps(feats: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B·S, h, w, C) or (B·S, C) → (B, S·h·w, C) token sequence."""
    if feats.ndim == 2:
        c = feats.shape[-1]
        return feats.reshape(batch, -1, c)
    bs, h, w, c = feats.shape
    return feats.reshape(batch, -1, c)


def _finalize(endpoints: dict, output_type: str):
    if output_type == "main":
        return endpoints["main"]
    if output_type == "dict":
        return endpoints
    raise ValueError(f"Unknown output_type: {output_type}")


def _cfg(config, *path, default=None):
    node = config
    for p in path:
        if node is None:
            return default
        node = node.get(p) if hasattr(node, "get") else node[p]
    return default if node is None else node


def _feat_kwargs(config, num_patches, depth_ch, with_cls=True):
    agg = config["agg"]
    return dict(
        num_patches=int(num_patches),
        patch_dim=int(depth_ch),
        emb_dim=int(depth_ch),
        depth=int(agg["depth"]),
        heads=int(agg["heads"]),
        mlp_dim=int(agg["mlp_dim"]),
        num_classes=int(config["output_channels"]),
        emb_dropout=float(agg["emb_dropout"]),
        with_cls=with_cls,
        mlp_dropout=float(agg["mlp_dropout"]),
        # int8 serving quantization of the FeaT dense stacks (agg.quant)
        quant=agg.get("quant"),
    )


class XR1Cnn(nn.Module):
    """XR-only classifier: FE → flatten → MLP head (cf. _xr1_cnn.py:9-81)."""

    config: Any
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input, train: bool = False):
        cfg = self.config
        fe = _make_fe(cfg["fe"], True, self.compute_dtype, "fe")
        x = _image_to_nhwc(input.astype(self.compute_dtype))
        feats = fe(x, train=train)                    # (B, C)

        agg = cfg["agg"]
        h = nn.Dropout(float(agg["dropout"]))(feats, deterministic=not train)
        h = nn.Dense(int(agg["hidden_size"]), dtype=self.compute_dtype,
                     name="agg_dense")(h)
        h = nn.relu(h)
        h = nn.Dropout(float(agg["dropout"]))(h, deterministic=not train)
        logits = nn.Dense(int(cfg["output_channels"]),
                          dtype=self.compute_dtype, name="final")(h)
        return _finalize({"main": logits.astype(jnp.float32)},
                         cfg["output_type"])


class MR1CnnTrf(nn.Module):
    """Single-MRI transformer classifier (cf. _mrN_cnn_trf.py:12-139)."""

    config: Any
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input, train: bool = False, return_attn: bool = False):
        cfg = self.config
        fe_cfg = cfg["fe"]
        with_gap = bool(fe_cfg["with_gap"])
        dims_view = fe_cfg.get("dims_view", "rc") or "rc"
        fe_ch = FE_OUT_CHANNELS[fe_cfg["arch"]]

        shape_in = _downscaled(cfg["input_size"][0], _cfg(cfg, "downscale") and
                               cfg["downscale"][0])
        if with_gap:
            spat = (1, 1, 1)
        else:
            spat = _fe_spatial(shape_in, fe_cfg["arch"])
        axis_tokens = _axis_token_count(shape_in, spat, dims_view)

        fe = _make_fe(fe_cfg, with_gap, self.compute_dtype, "fe")
        b = input.shape[0]
        slices, _ = _fold_volume_to_slices(input.astype(self.compute_dtype),
                                           dims_view)
        feats = fe(slices, train=train)
        if float(fe_cfg.get("dropout") or 0.0):
            feats = nn.Dropout(float(fe_cfg["dropout"]))(
                feats, deterministic=not train)
        tokens = _tokens_from_maps(feats, b)

        agg = FeaT(**_feat_kwargs(cfg, axis_tokens, fe_ch),
                   dtype=self.compute_dtype, name="agg")
        outputs, _, attns = agg(tokens, deterministic=not train,
                                return_attn=return_attn)
        logits = outputs.reshape(b, -1).astype(jnp.float32)
        endpoints = {"main": logits}
        if return_attn:
            endpoints["attn"] = attns
        return _finalize(endpoints, cfg["output_type"])


class MR2CnnTrf(nn.Module):
    """Two-MRI transformer classifier (cf. _mrN_cnn_trf.py:142-272)."""

    config: Any
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input0, input1, train: bool = False,
                 return_attn: bool = False):
        cfg = self.config
        fe_cfg = cfg["fe"]
        with_gap = bool(fe_cfg["with_gap"])
        dims_view = fe_cfg.get("dims_view", "rc") or "rc"
        fe_ch = FE_OUT_CHANNELS[fe_cfg["arch"]]
        num_slices = cfg["agg"]["num_slices"]
        # token count: the reference counts 'rc' tokens from agg.num_slices
        # with a hard shape check (_mrN_cnn_trf.py:181-200); cs/rs (an
        # extension — the reference offers dims_view only on MR1) derive
        # the count from the static shape oracle per branch
        n_tokens = 0
        for i in range(2):
            shape_in = _downscaled(cfg["input_size"][i],
                                   _cfg(cfg, "downscale") and
                                   cfg["downscale"][i])
            if with_gap:
                n_tokens += (int(num_slices[i]) if dims_view == "rc"
                             else _axis_token_count(shape_in, (1, 1, 1),
                                                    dims_view))
            elif dims_view == "rc":
                spat = _fe_spatial(shape_in[:2], fe_cfg["arch"])
                n_tokens += int(num_slices[i]) * spat[0] * spat[1]
            else:
                spat = _fe_spatial(shape_in, fe_cfg["arch"])
                n_tokens += _axis_token_count(shape_in, spat, dims_view)

        b = input0.shape[0]
        tokens = []
        for idx, x in enumerate((input0, input1)):
            fe = _make_fe(fe_cfg, with_gap, self.compute_dtype,
                          f"fe{idx}")
            slices, _ = _fold_volume_to_slices(x.astype(self.compute_dtype),
                                               dims_view)
            feats = fe(slices, train=train)
            if float(fe_cfg.get("dropout") or 0.0):
                feats = nn.Dropout(float(fe_cfg["dropout"]))(
                    feats, deterministic=not train)
            tokens.append(_tokens_from_maps(feats, b))
        tokens = jnp.concatenate(tokens, axis=1)

        agg = FeaT(**_feat_kwargs(cfg, n_tokens, fe_ch),
                   dtype=self.compute_dtype, name="agg")
        outputs, _, attns = agg(tokens, deterministic=not train,
                                return_attn=return_attn)
        logits = outputs.reshape(b, -1).astype(jnp.float32)
        endpoints = {"main": logits}
        if return_attn:
            endpoints["attn"] = attns
        return _finalize(endpoints, cfg["output_type"])


class FeatC1(nn.Module):
    """Clinical-vector encoder: Linear → GELU → Dropout
    (cf. _xrNmrMcP.py:11-29)."""

    dim_out: int
    dropout: float
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.dim_out, dtype=self.compute_dtype, name="fe")(
            x.astype(self.compute_dtype))
        x = nn.gelu(x, approximate=False)
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class _XrMrFusionBase(nn.Module):
    """Shared machinery of the XR+MRI fusion families."""

    config: Any
    compute_dtype: Any = jnp.float32

    def _shapes(self, n_branches):
        cfg = self.config
        sizes = [list(cfg["input_size"][i]) for i in range(n_branches)]
        ds = _cfg(cfg, "downscale")
        return [
            _downscaled(sizes[i], ds and cfg["downscale"][i])
            for i in range(n_branches)
        ]

    def _xr_tokens(self, input0, train):
        cfg = self.config
        xr_cfg = cfg["fe"]["xr"]
        fe = _make_fe(xr_cfg, bool(xr_cfg["with_gap"]),
                      self.compute_dtype, "fe_xr")
        feats = fe(_image_to_nhwc(input0.astype(self.compute_dtype)),
                   train=train)
        if float(xr_cfg.get("dropout") or 0.0):
            feats = nn.Dropout(float(xr_cfg["dropout"]))(
                feats, deterministic=not train)
        return _tokens_from_maps(feats, input0.shape[0])

    def _mr_tokens(self, x, name, train):
        cfg = self.config
        mr_cfg = cfg["fe"]["mr"]
        dims_view = mr_cfg.get("dims_view", "rc") or "rc"
        fe = _make_fe(mr_cfg, bool(mr_cfg["with_gap"]),
                      self.compute_dtype, name)
        slices, _ = _fold_volume_to_slices(x.astype(self.compute_dtype),
                                           dims_view)
        feats = fe(slices, train=train)
        if float(mr_cfg.get("dropout") or 0.0):
            feats = nn.Dropout(float(mr_cfg["dropout"]))(
                feats, deterministic=not train)
        return _tokens_from_maps(feats, x.shape[0])

    def _token_counts(self, shapes, n_mr):
        cfg = self.config
        xr_cfg = cfg["fe"]["xr"]
        mr_cfg = cfg["fe"]["mr"]
        mr_gap = bool(mr_cfg["with_gap"])
        dims_view = mr_cfg.get("dims_view", "rc") or "rc"
        n_xr = (1 if bool(xr_cfg["with_gap"])
                else math.prod(_fe_spatial(shapes[0], xr_cfg["arch"])))
        ns = cfg["agg"]["num_slices"]
        counts = [n_xr]
        for i in range(1, 1 + n_mr):
            if mr_gap:
                counts.append(int(ns[i]) if dims_view == "rc" else
                              _axis_token_count(shapes[i], (1, 1, 1),
                                                dims_view))
            elif dims_view == "rc":
                spat = _fe_spatial(shapes[i][:2], mr_cfg["arch"])
                counts.append(int(ns[i]) * spat[0] * spat[1])
            else:
                spat = _fe_spatial(shapes[i], mr_cfg["arch"])
                counts.append(_axis_token_count(shapes[i], spat, dims_view))
        return counts


class XR1MR1CnnTrf(_XrMrFusionBase):
    """XR + 1 MRI, single shared FeaT over concatenated tokens
    (cf. _xr1mrN.py:11-158)."""

    @nn.compact
    def __call__(self, input0, input1, train: bool = False,
                 return_attn: bool = False):
        cfg = self.config
        shapes = self._shapes(2)
        counts = self._token_counts(shapes, n_mr=1)
        fe_ch = FE_OUT_CHANNELS[cfg["fe"]["mr"]["arch"]]

        tokens = jnp.concatenate([
            self._xr_tokens(input0, train),
            self._mr_tokens(input1, "fe_mr1", train),
        ], axis=1)

        agg = FeaT(**_feat_kwargs(cfg, sum(counts), fe_ch),
                   dtype=self.compute_dtype, name="agg")
        outputs, _, attns = agg(tokens, deterministic=not train,
                                return_attn=return_attn)
        logits = outputs.reshape(input0.shape[0], -1).astype(jnp.float32)
        endpoints = {"main": logits}
        if return_attn:
            endpoints["attn"] = attns
        return _finalize(endpoints, cfg["output_type"])


class XR1MR2CnnTrf(_XrMrFusionBase):
    """XR + 2 MRI hierarchical fusion: per-MR CLS-less FeaTs produce
    contextualized states, concatenated with raw XR tokens into a final
    CLS-FeaT (cf. _xr1mrN.py:161-369)."""

    @nn.compact
    def __call__(self, input0, input1, input2, train: bool = False,
                 return_attn: bool = False):
        cfg = self.config
        shapes = self._shapes(3)
        counts = self._token_counts(shapes, n_mr=2)
        fe_ch = FE_OUT_CHANNELS[cfg["fe"]["mr"]["arch"]]

        t_xr = self._xr_tokens(input0, train)
        t_mr1 = self._mr_tokens(input1, "fe_mr1", train)
        t_mr2 = self._mr_tokens(input2, "fe_mr2", train)

        agg1 = FeaT(**_feat_kwargs(cfg, counts[1], fe_ch, with_cls=False),
                    dtype=self.compute_dtype, name="agg_1")
        agg2 = FeaT(**_feat_kwargs(cfg, counts[2], fe_ch, with_cls=False),
                    dtype=self.compute_dtype, name="agg_2")
        _, s_mr1, _ = agg1(t_mr1, deterministic=not train)
        _, s_mr2, _ = agg2(t_mr2, deterministic=not train)

        tokens = jnp.concatenate([t_xr, s_mr1, s_mr2], axis=1)
        agg_final = FeaT(**_feat_kwargs(cfg, sum(counts), fe_ch),
                         dtype=self.compute_dtype, name="agg_final")
        outputs, _, attns = agg_final(tokens, deterministic=not train,
                                      return_attn=return_attn)
        logits = outputs.reshape(input0.shape[0], -1).astype(jnp.float32)
        endpoints = {"main": logits}
        if return_attn:
            endpoints["attn"] = attns
        return _finalize(endpoints, cfg["output_type"])


class XR1MR2C1CnnTrf(_XrMrFusionBase):
    """Flagship 4-modality model: XR tokens + 2 hierarchical MRI FeaTs +
    clinical token, fused by a final CLS-FeaT (cf. _xrNmrMcP.py:32-264)."""

    @nn.compact
    def __call__(self, input0, input1, input2, input3, train: bool = False,
                 return_attn: bool = False):
        cfg = self.config
        shapes = self._shapes(3)
        counts = self._token_counts(shapes, n_mr=2)
        n_clin = int(cfg["agg"]["num_slices"][3])
        fe_ch = FE_OUT_CHANNELS[cfg["fe"]["mr"]["arch"]]

        t_xr = self._xr_tokens(input0, train)
        t_mr1 = self._mr_tokens(input1, "fe_mr1", train)
        t_mr2 = self._mr_tokens(input2, "fe_mr2", train)
        # clinical branch: (B, CH=1, 9) → (B, 1, fe_ch) token
        t_clin = FeatC1(dim_out=fe_ch,
                        dropout=float(cfg["fe"]["clin"]["dropout"]),
                        compute_dtype=self.compute_dtype,
                        name="fe_clin")(input3, train=train)

        agg1 = FeaT(**_feat_kwargs(cfg, counts[1], fe_ch, with_cls=False),
                    dtype=self.compute_dtype, name="agg_1")
        agg2 = FeaT(**_feat_kwargs(cfg, counts[2], fe_ch, with_cls=False),
                    dtype=self.compute_dtype, name="agg_2")
        _, s_mr1, _ = agg1(t_mr1, deterministic=not train)
        _, s_mr2, _ = agg2(t_mr2, deterministic=not train)

        tokens = jnp.concatenate([t_xr, s_mr1, s_mr2,
                                  t_clin.astype(s_mr1.dtype)], axis=1)
        agg_final = FeaT(
            **_feat_kwargs(cfg, sum(counts) + n_clin, fe_ch),
            dtype=self.compute_dtype, name="agg_final")
        outputs, _, attns = agg_final(tokens, deterministic=not train,
                                      return_attn=return_attn)
        logits = outputs.reshape(input0.shape[0], -1).astype(jnp.float32)
        endpoints = {"main": logits}
        if return_attn:
            endpoints["attn"] = attns
        return _finalize(endpoints, cfg["output_type"])
