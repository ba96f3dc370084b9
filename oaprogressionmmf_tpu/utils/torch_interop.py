"""Reference-checkpoint interop: torch `.pth` state dicts ↔ flax variables.

The reference saves bare `state_dict()` files per fold
(koafusion/various/_checkpoint.py:56-59) with module names fixed by its
model definitions: feature extractors wrapped in `nn.Sequential` (children
of torchvision ResNet → numeric indices), the FeaT transformer's
`prenorm_0_{d}` / `attn_{d}.to_qkv` / `ff_{d}.net.{0,3}` / `mlp_head{i}`
naming (`_core_trf.py:74-205`), and per-family branch names `_fe*`,
`_agg*`, `_final` (`_xr1_cnn.py`, `_mrN_cnn_trf.py`, `_xr1mrN.py`,
`_xrNmrMcP.py`).

This module converts both directions so (a) trained reference checkpoints
can be evaluated in this framework, and (b) models trained here can be
exported for the reference's tooling. All transforms are host-side numpy.
"""

from __future__ import annotations

import numpy as np

# torchvision-ResNet children → Sequential indices when wrapped with
# nn.Sequential(*list(model.children())[:-1]) (reference FE construction):
# 0 conv1, 1 bn1, 2 relu, 3 maxpool, 4-7 layer1-4, 8 avgpool
_SEQ_IDX_TO_LAYER = {4: "layer1", 5: "layer2", 6: "layer3", 7: "layer4"}
_LAYER_TO_SEQ_IDX = {v: k for k, v in _SEQ_IDX_TO_LAYER.items()}


def _t(a):
    return np.ascontiguousarray(np.transpose(np.asarray(a)))


def _conv_t2f(w):  # (O, I/g, kh, kw) → (kh, kw, I/g, O)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _conv_f2t(w):  # (kh, kw, I/g, O) → (O, I/g, kh, kw)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


# ---------------------------------------------------------------------------
# ResNet FE (Sequential-wrapped) ↔ flax ResNetFE
# ---------------------------------------------------------------------------

def torch_seq_fe_to_flax(sd: dict, prefix: str):
    """Reference `_fe` Sequential state dict → (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(dst_params, dst_stats, src):
        put(params, dst_params + ("scale",), np.asarray(sd[src + ".weight"]))
        put(params, dst_params + ("bias",), np.asarray(sd[src + ".bias"]))
        put(stats, dst_stats + ("mean",),
            np.asarray(sd[src + ".running_mean"]))
        put(stats, dst_stats + ("var",), np.asarray(sd[src + ".running_var"]))

    put(params, ("conv1", "kernel"), _conv_t2f(sd[f"{prefix}.0.weight"]))
    bn(("bn1",), ("bn1",), f"{prefix}.1")

    for seq_idx, layer in _SEQ_IDX_TO_LAYER.items():
        b = 0
        while f"{prefix}.{seq_idx}.{b}.conv1.weight" in sd:
            src = f"{prefix}.{seq_idx}.{b}"
            dst = f"{layer}_{b}"
            n_convs = 3 if f"{src}.conv3.weight" in sd else 2
            for ci in range(n_convs):
                put(params, (dst, f"Conv_{ci}", "kernel"),
                    _conv_t2f(sd[f"{src}.conv{ci + 1}.weight"]))
                bn((dst, f"BatchNorm_{ci}"), (dst, f"BatchNorm_{ci}"),
                   f"{src}.bn{ci + 1}")
            if f"{src}.downsample.0.weight" in sd:
                put(params, (dst, "downsample_conv", "kernel"),
                    _conv_t2f(sd[f"{src}.downsample.0.weight"]))
                bn((dst, "downsample_bn"), (dst, "downsample_bn"),
                   f"{src}.downsample.1")
            b += 1
    return params, stats


def flax_fe_to_torch_seq(params: dict, stats: dict, prefix: str) -> dict:
    """Inverse of :func:`torch_seq_fe_to_flax`."""
    sd: dict = {}

    def bn(src_p, src_s, dst):
        sd[dst + ".weight"] = np.asarray(src_p["scale"])
        sd[dst + ".bias"] = np.asarray(src_p["bias"])
        sd[dst + ".running_mean"] = np.asarray(src_s["mean"])
        sd[dst + ".running_var"] = np.asarray(src_s["var"])
        sd[dst + ".num_batches_tracked"] = np.asarray(0)

    sd[f"{prefix}.0.weight"] = _conv_f2t(params["conv1"]["kernel"])
    bn(params["bn1"], stats["bn1"], f"{prefix}.1")

    for name in sorted(params):
        if not name.startswith("layer"):
            continue
        layer, b = name.rsplit("_", 1)
        seq_idx = _LAYER_TO_SEQ_IDX[layer]
        src_p, src_s = params[name], stats[name]
        dst = f"{prefix}.{seq_idx}.{b}"
        ci = 0
        while f"Conv_{ci}" in src_p:
            sd[f"{dst}.conv{ci + 1}.weight"] = _conv_f2t(
                src_p[f"Conv_{ci}"]["kernel"])
            bn(src_p[f"BatchNorm_{ci}"], src_s[f"BatchNorm_{ci}"],
               f"{dst}.bn{ci + 1}")
            ci += 1
        if "downsample_conv" in src_p:
            sd[f"{dst}.downsample.0.weight"] = _conv_f2t(
                src_p["downsample_conv"]["kernel"])
            bn(src_p["downsample_bn"], src_s["downsample_bn"],
               f"{dst}.downsample.1")
    return sd


# ---------------------------------------------------------------------------
# FeaT ↔ flax FeaT
# ---------------------------------------------------------------------------

def torch_feat_to_flax(sd: dict, prefix: str, depth: int,
                       num_outputs: int = 1) -> dict:
    """Reference FeaT submodule state dict → flax FeaT params."""
    p: dict = {}
    if f"{prefix}.cls_token" in sd:
        p["cls_token"] = np.asarray(sd[f"{prefix}.cls_token"])
    p["pos_embedding"] = np.asarray(sd[f"{prefix}.pos_embedding"])
    p["patch_to_embedding"] = {
        "kernel": _t(sd[f"{prefix}.patch_to_embedding.weight"]),
        "bias": np.asarray(sd[f"{prefix}.patch_to_embedding.bias"]),
    }
    tr: dict = {}
    for d in range(depth):
        tp = f"{prefix}.transformer"
        tr[f"prenorm_0_{d}"] = {
            "scale": np.asarray(sd[f"{tp}.prenorm_0_{d}.weight"]),
            "bias": np.asarray(sd[f"{tp}.prenorm_0_{d}.bias"])}
        tr[f"prenorm_1_{d}"] = {
            "scale": np.asarray(sd[f"{tp}.prenorm_1_{d}.weight"]),
            "bias": np.asarray(sd[f"{tp}.prenorm_1_{d}.bias"])}
        # reference packs q/k/v into one (3d, d) Linear; the flax attention
        # uses separate kernels (exact tp head-parallelism) — a column
        # split of the transposed kernel is numerically identical
        w_qkv = _t(sd[f"{tp}.attn_{d}.to_qkv.weight"])   # (d, 3d)
        dim = w_qkv.shape[0]
        tr[f"attn_{d}"] = {
            "to_q": {"kernel": w_qkv[:, :dim]},
            "to_k": {"kernel": w_qkv[:, dim:2 * dim]},
            "to_v": {"kernel": w_qkv[:, 2 * dim:]},
            "to_out": {
                "kernel": _t(sd[f"{tp}.attn_{d}.to_out.0.weight"]),
                "bias": np.asarray(sd[f"{tp}.attn_{d}.to_out.0.bias"])}}
        tr[f"ff_{d}"] = {
            "Dense_0": {"kernel": _t(sd[f"{tp}.ff_{d}.net.0.weight"]),
                        "bias": np.asarray(sd[f"{tp}.ff_{d}.net.0.bias"])},
            "Dense_1": {"kernel": _t(sd[f"{tp}.ff_{d}.net.3.weight"]),
                        "bias": np.asarray(sd[f"{tp}.ff_{d}.net.3.bias"])}}
    p["transformer"] = tr
    for i in range(num_outputs):
        hp = f"{prefix}.mlp_head{i}"
        p[f"mlp_head{i}_norm"] = {
            "scale": np.asarray(sd[f"{hp}.0.weight"]),
            "bias": np.asarray(sd[f"{hp}.0.bias"])}
        p[f"mlp_head{i}_dense0"] = {
            "kernel": _t(sd[f"{hp}.1.weight"]),
            "bias": np.asarray(sd[f"{hp}.1.bias"])}
        p[f"mlp_head{i}_dense1"] = {
            "kernel": _t(sd[f"{hp}.4.weight"]),
            "bias": np.asarray(sd[f"{hp}.4.bias"])}
    return p


def flax_feat_to_torch(p: dict, prefix: str) -> dict:
    """Inverse of :func:`torch_feat_to_flax`."""
    sd: dict = {}
    if "cls_token" in p:
        sd[f"{prefix}.cls_token"] = np.asarray(p["cls_token"])
    sd[f"{prefix}.pos_embedding"] = np.asarray(p["pos_embedding"])
    sd[f"{prefix}.patch_to_embedding.weight"] = _t(
        p["patch_to_embedding"]["kernel"])
    sd[f"{prefix}.patch_to_embedding.bias"] = np.asarray(
        p["patch_to_embedding"]["bias"])
    tr = p["transformer"]
    d = 0
    while f"prenorm_0_{d}" in tr:
        tp = f"{prefix}.transformer"
        sd[f"{tp}.prenorm_0_{d}.weight"] = np.asarray(
            tr[f"prenorm_0_{d}"]["scale"])
        sd[f"{tp}.prenorm_0_{d}.bias"] = np.asarray(
            tr[f"prenorm_0_{d}"]["bias"])
        sd[f"{tp}.prenorm_1_{d}.weight"] = np.asarray(
            tr[f"prenorm_1_{d}"]["scale"])
        sd[f"{tp}.prenorm_1_{d}.bias"] = np.asarray(
            tr[f"prenorm_1_{d}"]["bias"])
        sd[f"{tp}.attn_{d}.to_qkv.weight"] = _t(
            np.concatenate([np.asarray(tr[f"attn_{d}"][k]["kernel"])
                            for k in ("to_q", "to_k", "to_v")], axis=1))
        sd[f"{tp}.attn_{d}.to_out.0.weight"] = _t(
            tr[f"attn_{d}"]["to_out"]["kernel"])
        sd[f"{tp}.attn_{d}.to_out.0.bias"] = np.asarray(
            tr[f"attn_{d}"]["to_out"]["bias"])
        sd[f"{tp}.ff_{d}.net.0.weight"] = _t(tr[f"ff_{d}"]["Dense_0"]["kernel"])
        sd[f"{tp}.ff_{d}.net.0.bias"] = np.asarray(
            tr[f"ff_{d}"]["Dense_0"]["bias"])
        sd[f"{tp}.ff_{d}.net.3.weight"] = _t(tr[f"ff_{d}"]["Dense_1"]["kernel"])
        sd[f"{tp}.ff_{d}.net.3.bias"] = np.asarray(
            tr[f"ff_{d}"]["Dense_1"]["bias"])
        d += 1
    i = 0
    while f"mlp_head{i}_norm" in p:
        hp = f"{prefix}.mlp_head{i}"
        sd[f"{hp}.0.weight"] = np.asarray(p[f"mlp_head{i}_norm"]["scale"])
        sd[f"{hp}.0.bias"] = np.asarray(p[f"mlp_head{i}_norm"]["bias"])
        sd[f"{hp}.1.weight"] = _t(p[f"mlp_head{i}_dense0"]["kernel"])
        sd[f"{hp}.1.bias"] = np.asarray(p[f"mlp_head{i}_dense0"]["bias"])
        sd[f"{hp}.4.weight"] = _t(p[f"mlp_head{i}_dense1"]["kernel"])
        sd[f"{hp}.4.bias"] = np.asarray(p[f"mlp_head{i}_dense1"]["bias"])
        i += 1
    return sd


# ---------------------------------------------------------------------------
# Full-model conversion
# ---------------------------------------------------------------------------

# family → [(flax subtree, torch prefix, kind)]
_FAMILY_LAYOUT = {
    "XR1Cnn": [("fe", "_fe", "fe")],
    "MR1CnnTrf": [("fe", "_fe", "fe"), ("agg", "_agg", "feat")],
    "MR2CnnTrf": [("fe0", "_fe0", "fe"), ("fe1", "_fe1", "fe"),
                  ("agg", "_agg", "feat")],
    "XR1MR1CnnTrf": [("fe_xr", "_fe0", "fe"), ("fe_mr1", "_fe1", "fe"),
                     ("agg", "_agg", "feat")],
    "XR1MR2CnnTrf": [("fe_xr", "_fe0", "fe"), ("fe_mr1", "_fe1", "fe"),
                     ("fe_mr2", "_fe2", "fe"),
                     ("agg_1", "_agg_1", "feat"), ("agg_2", "_agg_2", "feat"),
                     ("agg_final", "_agg_final", "feat")],
    "XR1MR2C1CnnTrf": [("fe_xr", "_fe0", "fe"), ("fe_mr1", "_fe1", "fe"),
                       ("fe_mr2", "_fe2", "fe"), ("fe_clin", "_fe3", "clin"),
                       ("agg_1", "_agg_1", "feat"),
                       ("agg_2", "_agg_2", "feat"),
                       ("agg_final", "_agg_final", "feat")],
}


def import_reference_checkpoint(model_name: str, sd: dict, depth: int = 4
                                ) -> dict:
    """Reference `.pth` state dict → {"params", "batch_stats"} variables.

    `sd` maps torch names to array-likes (e.g. from
    `torch.load(..., map_location="cpu")`).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    for subtree, prefix, kind in _FAMILY_LAYOUT[model_name]:
        if kind == "fe":
            p, s = torch_seq_fe_to_flax(sd, prefix)
            params[subtree] = p
            stats[subtree] = s
        elif kind == "feat":
            params[subtree] = torch_feat_to_flax(sd, prefix, depth=depth)
        elif kind == "clin":
            params[subtree] = {"fe": {
                "kernel": _t(sd[f"{prefix}._fe.0.weight"]),
                "bias": np.asarray(sd[f"{prefix}._fe.0.bias"])}}
    if model_name == "XR1Cnn":
        params["agg_dense"] = {"kernel": _t(sd["_agg.1.weight"]),
                               "bias": np.asarray(sd["_agg.1.bias"])}
        params["final"] = {"kernel": _t(sd["_final.weight"]),
                           "bias": np.asarray(sd["_final.bias"])}
    return {"params": params, "batch_stats": stats}


def export_reference_checkpoint(model_name: str, variables: dict) -> dict:
    """{"params", "batch_stats"} → reference-named torch state dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}
    for subtree, prefix, kind in _FAMILY_LAYOUT[model_name]:
        if kind == "fe":
            sd.update(flax_fe_to_torch_seq(params[subtree],
                                           stats.get(subtree, {}), prefix))
        elif kind == "feat":
            sd.update(flax_feat_to_torch(params[subtree], prefix))
        elif kind == "clin":
            sd[f"{prefix}._fe.0.weight"] = _t(params[subtree]["fe"]["kernel"])
            sd[f"{prefix}._fe.0.bias"] = np.asarray(
                params[subtree]["fe"]["bias"])
    if model_name == "XR1Cnn":
        sd["_agg.1.weight"] = _t(params["agg_dense"]["kernel"])
        sd["_agg.1.bias"] = np.asarray(params["agg_dense"]["bias"])
        sd["_final.weight"] = _t(params["final"]["kernel"])
        sd["_final.bias"] = np.asarray(params["final"]["bias"])
    return sd
