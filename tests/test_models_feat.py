"""FeaT transformer: semantics parity with the reference core.

Oracle: a minimal torch implementation of the same computation graph
(pre-LN blocks, fused QKV without bias, full-width softmax scale, CLS +
learned pos-emb, per-output MLP heads) — the semantics documented from
koafusion/models/_core_trf.py:74-205. Weights are copied from the flax init
so outputs must match numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from oaprogressionmmf_tpu.models import FeaT


def _torch_feat_forward(params, feats, depth, heads, num_outputs):
    """Reference-semantics forward in torch using flax params."""
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    x = t(feats)
    emb_k = t(params["patch_to_embedding"]["kernel"])
    emb_b = t(params["patch_to_embedding"]["bias"])
    x = x @ emb_k + emb_b
    B = x.shape[0]
    cls = t(params["cls_token"]).expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + t(params["pos_embedding"])
    dim = x.shape[-1]
    scale = dim ** -0.5

    tr = params["transformer"]
    for d in range(depth):
        ln = tr[f"prenorm_0_{d}"]
        o = torch.nn.functional.layer_norm(x, (dim,), t(ln["scale"]),
                                           t(ln["bias"]), eps=1e-5)
        # reference fuses qkv into one (d, 3d) Linear; the flax module
        # stores the column-split kernels — concatenate to reproduce it
        qkv = o @ torch.cat([t(tr[f"attn_{d}"][kk]["kernel"])
                             for kk in ("to_q", "to_k", "to_v")], dim=-1)
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(B, -1, heads, dim // heads).transpose(1, 2)
        k = k.view(B, -1, heads, dim // heads).transpose(1, 2)
        v = v.view(B, -1, heads, dim // heads).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * scale, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, -1, dim)
        o = o @ t(tr[f"attn_{d}"]["to_out"]["kernel"]) + \
            t(tr[f"attn_{d}"]["to_out"]["bias"])
        x = o + x
        ln = tr[f"prenorm_1_{d}"]
        ff = torch.nn.functional.layer_norm(x, (dim,), t(ln["scale"]),
                                            t(ln["bias"]), eps=1e-5)
        ffp = tr[f"ff_{d}"]
        ff = ff @ t(ffp["Dense_0"]["kernel"]) + t(ffp["Dense_0"]["bias"])
        ff = torch.nn.functional.gelu(ff)
        ff = ff @ t(ffp["Dense_1"]["kernel"]) + t(ffp["Dense_1"]["bias"])
        x = ff + x

    outs = []
    for i in range(num_outputs):
        h = x[:, i]
        hp = params
        h = torch.nn.functional.layer_norm(
            h, (dim,), t(hp[f"mlp_head{i}_norm"]["scale"]),
            t(hp[f"mlp_head{i}_norm"]["bias"]), eps=1e-5)
        h = h @ t(hp[f"mlp_head{i}_dense0"]["kernel"]) + \
            t(hp[f"mlp_head{i}_dense0"]["bias"])
        h = torch.nn.functional.gelu(h)
        h = h @ t(hp[f"mlp_head{i}_dense1"]["kernel"]) + \
            t(hp[f"mlp_head{i}_dense1"]["bias"])
        outs.append(h)
    return torch.stack(outs, dim=1).numpy(), x.numpy()


def test_feat_matches_torch_semantics():
    depth, heads, P, pd, ed = 2, 2, 6, 16, 32
    model = FeaT(num_patches=P, patch_dim=pd, emb_dim=ed, depth=depth,
                 heads=heads, mlp_dim=24, num_classes=2)
    feats = np.random.RandomState(0).randn(3, P, pd).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        variables = model.init(jax.random.key(0), jnp.asarray(feats))
        out, states, _ = model.apply(variables, jnp.asarray(feats),
                                     deterministic=True)
    want_out, want_states = _torch_feat_forward(
        variables["params"], feats, depth, heads, num_outputs=1)
    np.testing.assert_allclose(np.asarray(out), want_out, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states), want_states, atol=2e-4)


def test_feat_no_cls_returns_contextualized_states():
    model = FeaT(num_patches=5, patch_dim=8, emb_dim=16, depth=1, heads=2,
                 mlp_dim=16, num_classes=2, with_cls=False)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 8), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out, states, _ = model.apply(variables, x, deterministic=True)
    assert states.shape == (2, 5, 16)  # no CLS prepended
    assert "cls_token" not in variables["params"]


def test_feat_returns_attention_maps_when_requested():
    model = FeaT(num_patches=4, patch_dim=8, emb_dim=16, depth=2, heads=2,
                 mlp_dim=16, num_classes=2)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 8), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    _, _, attns = model.apply(variables, x, deterministic=True,
                              return_attn=True)
    assert len(attns) == 2
    assert attns[0].shape == (1, 2, 5, 5)  # +1 CLS token
    np.testing.assert_allclose(np.asarray(attns[0].sum(-1)), 1.0, atol=1e-5)


def test_feat_flash_and_reference_paths_agree():
    # attn_impl="flash" forces the Pallas kernel even at tiny n (the
    # "auto" default would pick XLA dots below AUTO_FLASH_MIN_SEQ)
    model = FeaT(num_patches=10, patch_dim=8, emb_dim=32, depth=1, heads=2,
                 mlp_dim=16, num_classes=2, attn_impl="flash")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 10, 8), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out_flash, _, _ = model.apply(variables, x, deterministic=True,
                                  return_attn=False)
    out_ref, _, _ = model.apply(variables, x, deterministic=True,
                                return_attn=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               atol=1e-4)


def test_feat_fused_qkv_matches_split_and_tree_unchanged():
    """fuse_qkv concatenates the to_q/to_k/to_v kernels into one apply-time
    dot — same params, same numbers (serving knob; exp_feat_opts.py)."""
    kw = dict(num_patches=10, patch_dim=8, emb_dim=32, depth=2, heads=2,
              mlp_dim=16, num_classes=2)
    base = FeaT(**kw)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 10, 8), jnp.float32)
    variables = base.init(jax.random.key(0), x)
    out0, _, _ = base.apply(variables, x, deterministic=True)
    fused = FeaT(**kw, fuse_qkv=True)
    out1, _, _ = fused.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-5)
    vf = fused.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vf))


def test_feat_multi_output_heads():
    model = FeaT(num_patches=4, patch_dim=8, emb_dim=16, depth=1, heads=2,
                 mlp_dim=16, num_classes=3, num_cls_tokens=2, num_outputs=2)
    x = jnp.ones((2, 4, 8))
    variables = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 2, 3)


def test_feat_attention_mask_excludes_tokens():
    """Optional token mask (reference _core_trf.py:172-177 semantics):
    masked tokens must not influence the CLS output; CLS stays attended."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from oaprogressionmmf_tpu.models.feat import FeaT

    feat = FeaT(num_patches=6, patch_dim=8, emb_dim=8, depth=1, heads=2,
                mlp_dim=16, num_classes=2, emb_dropout=0.0, with_cls=True,
                mlp_dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 6, 8), jnp.float32)
    variables = feat.init(jax.random.key(0), x, deterministic=True)
    mask = jnp.asarray([[True, True, True, False, False, False]] * 2)

    out_a, _, attn_a = feat.apply(variables, x, deterministic=True,
                                  return_attn=True, mask=mask)
    # garbage in the masked tokens must not change the CLS logits
    x_b = x.at[:, 3:, :].set(1e3)
    out_b, _, _ = feat.apply(variables, x_b, deterministic=True,
                             return_attn=True, mask=mask)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5)
    # attention rows of unmasked queries put zero weight on masked keys
    a = np.asarray(attn_a[0])          # (B, H, 7, 7) incl CLS at 0
    np.testing.assert_allclose(a[:, :, 0, 4:], 0.0, atol=1e-7)
    # without the mask the same perturbation DOES change the output
    out_c, _, _ = feat.apply(variables, x_b, deterministic=True,
                             return_attn=True)
    assert np.abs(np.asarray(out_c) - np.asarray(out_a)).max() > 1e-3
