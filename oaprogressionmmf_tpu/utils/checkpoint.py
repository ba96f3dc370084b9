"""Rolling per-fold checkpoint store with exact-resume payloads.

Keeps the reference's addressing scheme — directory per (model, fold), file
name `{model_name}__fold_{fold_idx}__epoch_{epoch_idx:03d}.ckpt`, newest
`num_saved` files retained (koafusion/various/_checkpoint.py:14-62) — but
improves on it: the payload is the FULL train state (params + batch stats +
optimizer state + epoch + PRNG key data), serialized with flax msgpack, so
resume is exact rather than schedule-restarting (the reference only saved
bare model weights, cf. `_checkpoint.py:56-59`).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger("checkpoint")


class CheckpointHandler:
    def __init__(self, path_root,
                 fname_pattern=("{model_name}__"
                                "fold_{fold_idx}__"
                                "epoch_{epoch_idx:>03d}.ckpt"),
                 num_saved=1):
        self.path_root = Path(path_root)
        self.fname_pattern = fname_pattern
        self.num_saved = num_saved

        _, ext = os.path.splitext(self.fname_pattern)
        if not self.path_root.exists():
            raise ValueError(f"Path {self.path_root} does not exist")

        self._all_ckpts = sorted(self.path_root.glob("*" + ext))
        logger.info(f"Checkpoints found: {len(self._all_ckpts)}")
        self._remove_excessive_ckpts()

    def _remove_excessive_ckpts(self):
        while len(self._all_ckpts) > self.num_saved:
            try:
                os.remove(self._all_ckpts[0])
                logger.info(f"Removed ckpt: {self._all_ckpts[0]}")
                self._all_ckpts = self._all_ckpts[1:]
            except OSError:
                logger.error(f"Cannot remove {self._all_ckpts[0]}")
                break

    def get_last_ckpt(self):
        if len(self._all_ckpts) == 0:
            logger.warning(f"No checkpoints are available in {self.path_root}")
            return None
        return self._all_ckpts[-1]

    def save_new_ckpt(self, state, model_name, fold_idx, epoch_idx):
        """Serialize a pytree train state; returns the written path."""
        fname = self.fname_pattern.format(model_name=model_name,
                                          fold_idx=fold_idx,
                                          epoch_idx=epoch_idx)
        path_full = Path(self.path_root, fname)
        payload = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        path_full.write_bytes(serialization.to_bytes(payload))
        self._all_ckpts.append(path_full)
        self._remove_excessive_ckpts()
        return path_full


class OrbaxCheckpointHandler(CheckpointHandler):
    """Orbax-backed store: same addressing scheme, directory-per-epoch.

    Multi-host option (SURVEY §5.4 hardening): orbax writes atomically
    (tmp dir + rename), supports distributed/sharded arrays, and restores
    with per-leaf laziness. Select with ``training.ckpt_backend=orbax``;
    the default msgpack backend stays reference-shaped single-file.
    """

    def __init__(self, path_root, fname_pattern=("{model_name}__"
                                                 "fold_{fold_idx}__"
                                                 "epoch_{epoch_idx:>03d}"
                                                 ".orbax"),
                 num_saved=1):
        super().__init__(path_root, fname_pattern=fname_pattern,
                         num_saved=num_saved)

    def _remove_excessive_ckpts(self):
        import shutil

        while len(self._all_ckpts) > self.num_saved:
            try:
                shutil.rmtree(self._all_ckpts[0])
                logger.info(f"Removed ckpt: {self._all_ckpts[0]}")
                self._all_ckpts = self._all_ckpts[1:]
            except OSError:
                logger.error(f"Cannot remove {self._all_ckpts[0]}")
                break

    def save_new_ckpt(self, state, model_name, fold_idx, epoch_idx):
        import orbax.checkpoint as ocp

        fname = self.fname_pattern.format(model_name=model_name,
                                          fold_idx=fold_idx,
                                          epoch_idx=epoch_idx)
        path_full = Path(self.path_root, fname).resolve()
        payload = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path_full, payload, force=True)
        if path_full not in self._all_ckpts:
            self._all_ckpts.append(path_full)
        self._remove_excessive_ckpts()
        return path_full


def make_checkpoint_handler(path_root, backend: str = "msgpack",
                            num_saved: int = 1) -> CheckpointHandler:
    """Backend-selecting factory (``training.ckpt_backend``)."""
    if backend == "orbax":
        return OrbaxCheckpointHandler(path_root, num_saved=num_saved)
    if backend in ("msgpack", None, ""):
        return CheckpointHandler(path_root, num_saved=num_saved)
    raise ValueError(f"Unknown checkpoint backend: {backend}")


def migrate_legacy_qkv(tree):
    """Split legacy fused attention kernels in a restored state dict.

    Checkpoints written before the q/k/v unpacking (models/feat.py) hold
    one ``to_qkv.kernel`` of shape (d, 3d) per attention block; the
    current tree expects ``to_q``/``to_k``/``to_v`` of (d, d) each — a
    pure column split, numerically identical. Returns (tree, n_migrated).
    """
    n = 0

    def walk(node):
        nonlocal n
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "to_qkv" and isinstance(v, dict) and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 2):
                w = np.asarray(v["kernel"])
                d = w.shape[0]
                out["to_q"] = {"kernel": w[:, :d]}
                out["to_k"] = {"kernel": w[:, d:2 * d]}
                out["to_v"] = {"kernel": w[:, 2 * d:]}
                n += 1
            else:
                out[k] = walk(v)
        return out

    return walk(tree), n


def load_ckpt(path, target=None):
    """Restore a checkpoint written by either handler.

    With ``target`` (a pytree of matching structure), arrays are restored
    into its exact structure; without it, a nested dict is returned.
    Orbax checkpoints are directories; msgpack checkpoints are files.
    Legacy checkpoints with fused ``to_qkv`` attention kernels are
    migrated transparently (see :func:`migrate_legacy_qkv`).
    """
    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path.resolve())
        if target is not None:
            # orbax (no target) returns tuple nodes as plain lists and
            # empty containers (e.g. optax EmptyState) as None, but flax
            # from_state_dict expects index-keyed dicts for tuple targets
            # and {} for empty ones — convert before merging.
            def _lists_to_dicts(node):
                if node is None:
                    return {}
                if isinstance(node, list):
                    return {str(i): _lists_to_dicts(v)
                            for i, v in enumerate(node)}
                if isinstance(node, dict):
                    return {k: _lists_to_dicts(v) for k, v in node.items()}
                return node

            restored = _lists_to_dicts(restored)
            restored, _ = migrate_legacy_qkv(restored)
            return serialization.from_state_dict(target, restored)
        restored, _ = migrate_legacy_qkv(restored)
        return restored
    data = path.read_bytes()
    if target is not None:
        try:
            return serialization.from_bytes(target, data)
        except (ValueError, KeyError):
            raw = serialization.msgpack_restore(data)
            raw, n = migrate_legacy_qkv(raw)
            if not n:
                raise
            logger.info(f"Migrated {n} fused to_qkv kernels in {path}")
            return serialization.from_state_dict(target, raw)
    restored, _ = migrate_legacy_qkv(serialization.msgpack_restore(data))
    return restored
