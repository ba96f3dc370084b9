"""ImageNet initialization for the CNN encoders.

The reference downloads torchvision ImageNet checkpoints at construction
time (koafusion/models/_torchvision.py:12-20 URL table, used when
`model.fe.*.pretrained: true`). This environment has no egress, so weights
are resolved from local files instead: `$OAPROG_PRETRAINED_DIR` or the
standard torch-hub cache, by the torchvision checkpoint filename. The torch
state dict is converted to flax layout via
models.resnet.convert_torch_resnet_state and grafted into the initialized
parameter tree.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger("pretrained")

# torchvision model-zoo checkpoint filenames per architecture
CHECKPOINT_FILES = {
    "resnet18": "resnet18-5c106cde.pth",
    "resnet34": "resnet34-333f7ec4.pth",
    "resnet50": "resnet50-19c8e357.pth",
    "resnext50_32x4d": "resnext50_32x4d-7cdf4587.pth",
    "squeezenet1_0": "squeezenet1_0-a815701f.pth",
    "vgg16": "vgg16-397923af.pth",
    "densenet161": "densenet161-8d451a50.pth",
    "inception_v3": "inception_v3_google-1a9a5a14.pth",
}


def find_checkpoint(arch: str) -> Path | None:
    """Locate a local torchvision checkpoint for `arch`, or None."""
    fname = CHECKPOINT_FILES.get(arch)
    if fname is None:
        return None
    candidates = []
    env_dir = os.environ.get("OAPROG_PRETRAINED_DIR")
    if env_dir:
        candidates.append(Path(env_dir) / fname)
        candidates.append(Path(env_dir) / f"{arch}.pth")
    hub = os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch"))
    candidates.append(Path(hub) / "hub" / "checkpoints" / fname)
    for c in candidates:
        if c.exists():
            return c
    return None


def _converter_for(arch: str):
    from ..models import encoders
    from ..models.resnet import convert_torch_resnet_state

    return {
        "squeezenet1_0": encoders.convert_torch_squeezenet_state,
        "vgg16": encoders.convert_torch_vgg_state,
        "densenet161": encoders.convert_torch_densenet_state,
        "inception_v3": encoders.convert_torch_inception_state,
    }.get(arch, convert_torch_resnet_state)


def load_imagenet_fe_params(arch: str, path=None):
    """→ (flax params, batch_stats) or None when no weights are available."""
    import torch

    path = Path(path) if path else find_checkpoint(arch)
    if path is None or not Path(path).exists():
        logger.warning(
            f"No local ImageNet checkpoint for {arch} "
            f"(set OAPROG_PRETRAINED_DIR); falling back to random init")
        return None
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    logger.info(f"Loaded ImageNet weights for {arch} from {path}")
    return _converter_for(arch)(sd)


# model family → (FE param-subtree name, config path to the fe subtree)
FE_SUBTREES = {
    "XR1Cnn": [("fe", ("fe",))],
    "MR1CnnTrf": [("fe", ("fe",))],
    "MR2CnnTrf": [("fe0", ("fe",)), ("fe1", ("fe",))],
    "XR1MR1CnnTrf": [("fe_xr", ("fe", "xr")), ("fe_mr1", ("fe", "mr"))],
    "XR1MR2CnnTrf": [("fe_xr", ("fe", "xr")), ("fe_mr1", ("fe", "mr")),
                     ("fe_mr2", ("fe", "mr"))],
    "XR1MR2C1CnnTrf": [("fe_xr", ("fe", "xr")), ("fe_mr1", ("fe", "mr")),
                       ("fe_mr2", ("fe", "mr"))],
}


def apply_pretrained_fes(model_cfg: dict, params: dict, batch_stats: dict):
    """Graft ImageNet FE weights into an initialized variable tree in-place.

    Returns (params, batch_stats, n_grafted)."""
    name = model_cfg["name"]
    n = 0
    cache: dict = {}
    for subtree, cfg_path in FE_SUBTREES.get(name, []):
        fe_cfg = model_cfg
        for p in cfg_path:
            fe_cfg = fe_cfg[p]
        if not fe_cfg.get("pretrained", False):
            continue
        arch = fe_cfg["arch"]
        if arch not in cache:
            cache[arch] = load_imagenet_fe_params(
                arch, path=fe_cfg.get("path_weights"))
        loaded = cache[arch]
        if loaded is None:
            continue
        fe_params, fe_stats = loaded
        if subtree not in params:
            logger.warning(f"FE subtree {subtree} not in params; skipped")
            continue
        params[subtree] = fe_params
        if fe_stats or subtree in batch_stats:
            # BN-free encoders (squeezenet/vgg) have no stats subtree —
            # don't introduce one (would change the variable-tree structure
            # checkpoints are restored against)
            batch_stats[subtree] = fe_stats
        n += 1
    return params, batch_stats, n
