"""FeaT — the feature-transformer token aggregator, in flax.

Functional parity with koafusion/models/_core_trf.py:74-205: linear
patch→embedding, optional learned CLS token(s), learned positional
embedding over `num_patches + num_cls_tokens`, pre-LN residual blocks
(fused-QKV attention without biases, GELU MLP), N mlp heads read from the
first `num_outputs` token states. Returns (outputs, states, attentions).

TPU-first: attention runs through the Pallas flash kernel
(ops/flash_attention.py) unless attention maps are requested — the
explainability path uses the XLA reference attention which returns maps.
Parity quirk preserved: scores are scaled by emb_dim**-0.5 (full model
width, `_core_trf.py:160`), not per-head width.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.flash_attention import attention_reference, flash_attention
from ..ops.quant import quant_dense_apply

# attn_impl="auto" switches from XLA dots to the Pallas flash kernel at
# this (static) token count — below it the kernel's grid/padding overhead
# dominates (exp_feat_opts.py)
AUTO_FLASH_MIN_SEQ = 256


class QDense(nn.Module):
    """Drop-in nn.Dense with the int8 serving modes (ops/quant.py):
    identical kernel/bias params, so trees and checkpoints are unchanged;
    LN/softmax/residual math stays in `dtype`."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if return_kernel:
            # parameter access without applying (the fused-qkv serving
            # path concatenates kernels and runs one dot)
            return kernel, bias
        return quant_dense_apply(self, x, kernel, bias, self.dtype,
                                 self.quant)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # explicit Dense_* names keep the tree identical to the original
        # auto-named nn.Dense modules
        x = QDense(self.hidden_dim, dtype=self.dtype, quant=self.quant,
                   name="Dense_0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = QDense(self.dim, dtype=self.dtype, quant=self.quant,
                   name="Dense_1")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32
    quant: str | None = None
    # attention implementation (numerics-identical; exp_feat_opts.py,
    # batch 64 / 91 tokens / d2048: dots 11.4 ms vs flash 13.6):
    #   "auto"      — plain XLA dots below AUTO_FLASH_MIN_SEQ tokens
    #                 (the kernel's grid/padding overhead dominates tiny
    #                 sequences), Pallas flash at long ones (the 2.4k-token
    #                 with_gap=false configs, where flash is 1.8x XLA);
    #   "reference" — always XLA dots; "flash" — always the kernel.
    # fuse_qkv concatenates the three (d, d) kernels into one (d, 3d) dot
    # at apply time (params stay split for TP/checkpoints) — measured
    # SLOWER at the design point (12.4 vs 11.4 ms); kept as a knob with
    # the negative result recorded.
    attn_impl: str = "auto"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_attn: bool = False, mask=None):
        b, n, d = x.shape
        h = self.heads
        scale = self.dim ** -0.5  # full-width scale (reference parity)

        # separate q/k/v kernels (the reference fuses them into one
        # (d, 3d) Linear, _core_trf.py:160; a column split of that kernel
        # is numerically identical). Unpacked, the per-projection (d, d)
        # kernels shard column-parallel over the tp "model" axis with
        # EXACT head parallelism — the packed layout depended on GSPMD
        # propagation through the (3, h, dh) reshape (parallel/tp.py).
        def proj(name):
            y = QDense(self.dim, use_bias=False, dtype=self.dtype,
                       quant=self.quant, name=name)(x)
            return jnp.moveaxis(y.reshape(b, n, h, d // h), 1, 2)

        if self.fuse_qkv and self.quant is None:
            # one (d, 3d) dot over the concatenated kernels — identical
            # math, one big MXU call instead of three (single-chip
            # serving; TP shards the split kernels instead)
            kernels = [QDense(self.dim, use_bias=False, dtype=self.dtype,
                              name=nm)(x, return_kernel=True)[0]
                       for nm in ("to_q", "to_k", "to_v")]
            w = jnp.concatenate(kernels, axis=1).astype(self.dtype)
            y = jnp.dot(x.astype(self.dtype), w)
            y = y.reshape(b, n, 3, h, d // h)
            q, k, v = (jnp.moveaxis(y[:, :, i], 1, 2) for i in range(3))
        else:
            q, k, v = proj("to_q"), proj("to_k"), proj("to_v")

        use_flash = (self.attn_impl == "flash"
                     or (self.attn_impl == "auto"
                         and n >= AUTO_FLASH_MIN_SEQ))
        if mask is not None:
            # reference semantics (_core_trf.py:172-177): pairwise
            # outer-product token mask, excluded scores → −inf
            pair = mask[:, None, :] & mask[:, :, None]
            out, attn = attention_reference(q, k, v, scale, pair_mask=pair)
        elif return_attn or not use_flash:
            out, attn = attention_reference(q, k, v, scale)
            if not return_attn:
                attn = None
        else:
            out = flash_attention(q, k, v, scale=scale)
            attn = None

        out = jnp.moveaxis(out, 1, 2).reshape(b, n, d)
        out = QDense(self.dim, dtype=self.dtype, quant=self.quant,
                     name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, attn


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float
    dtype: Any = jnp.float32
    quant: str | None = None
    attn_impl: str = "flash"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_attn: bool = False, mask=None):
        attentions = []
        for d in range(self.depth):
            o = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"prenorm_0_{d}")(x)
            o, attn = Attention(self.dim, self.heads, self.dropout,
                                dtype=self.dtype, quant=self.quant,
                                attn_impl=self.attn_impl,
                                fuse_qkv=self.fuse_qkv,
                                name=f"attn_{d}")(
                o, deterministic=deterministic, return_attn=return_attn,
                mask=mask)
            attentions.append(attn)
            x = o + x
            ff = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"prenorm_1_{d}")(x)
            ff = FeedForward(self.dim, self.mlp_dim, self.dropout,
                             dtype=self.dtype, quant=self.quant,
                             name=f"ff_{d}")(
                ff, deterministic=deterministic)
            x = ff + x
        return x, attentions


class FeaT(nn.Module):
    num_patches: int
    patch_dim: int
    emb_dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_classes: int
    emb_dropout: float = 0.0
    with_cls: bool = True
    num_cls_tokens: int = 1
    mlp_dropout: float = 0.0
    num_outputs: int = 1
    dtype: Any = jnp.float32
    # int8 serving quantization of the dense stacks (ops/quant.py);
    # eval-only, parameter tree unchanged
    quant: str | None = None
    # serving attention knobs (see Attention): numerics-identical
    attn_impl: str = "flash"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, features, deterministic: bool = True,
                 return_attn: bool = False, mask=None):
        """features: (B, num_patches, patch_dim) → (outputs, states, attns).

        outputs: (B, num_outputs, num_classes); states: (B, tokens, emb_dim).
        ``mask``: optional (B, num_patches) boolean token mask — CLS tokens
        are always attended (reference pads the mask with True,
        _core_trf.py:172-173).
        """
        b = features.shape[0]
        n_cls = self.num_cls_tokens if self.with_cls else 0
        if mask is not None and n_cls:
            mask = jnp.concatenate(
                [jnp.ones((b, n_cls), dtype=bool), mask.astype(bool)],
                axis=1)

        x = QDense(self.emb_dim, dtype=self.dtype, quant=self.quant,
                   name="patch_to_embedding")(features)

        if self.with_cls:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, self.num_cls_tokens, self.emb_dim))
            cls = jnp.broadcast_to(cls, (b, self.num_cls_tokens, self.emb_dim))
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)

        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches + n_cls, self.emb_dim))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        states, attentions = Transformer(
            self.emb_dim, self.depth, self.heads, self.mlp_dim,
            self.mlp_dropout, dtype=self.dtype, quant=self.quant,
            attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv,
            name="transformer")(
            x, deterministic=deterministic, return_attn=return_attn,
            mask=mask)

        outputs = []
        for i in range(self.num_outputs):
            h = states[:, i]
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"mlp_head{i}_norm")(h)
            h = QDense(self.mlp_dim, dtype=self.dtype, quant=self.quant,
                       name=f"mlp_head{i}_dense0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.mlp_dropout)(h, deterministic=deterministic)
            h = QDense(self.num_classes, dtype=self.dtype,
                       quant=self.quant, name=f"mlp_head{i}_dense1")(h)
            outputs.append(h)
        outputs = jnp.stack(outputs, axis=1)
        return outputs, states, attentions
