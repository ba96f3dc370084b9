"""Determinism controls — JAX PRNG-key discipline replacing torch seeding.

The reference's `set_ultimate_seed` (koafusion/various/_seed.py:1-20) seeds
PYTHONHASHSEED/random/numpy/torch and pins cuDNN determinism. In JAX all
device-side randomness flows through explicit PRNG keys, so the seeding
surface is: host RNGs (for data order / splits) + a root `jax.random` key.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_ultimate_seed(base_seed: int = 777) -> None:
    """Seed every host-side RNG. Device randomness uses explicit keys."""
    os.environ["PYTHONHASHSEED"] = str(base_seed)
    random.seed(base_seed)
    np.random.seed(base_seed)
    try:  # torch is host-side only in this framework (weight import, parity tests)
        import torch
        torch.manual_seed(base_seed)
    except ImportError:
        pass


class PRNGChain:
    """Deterministic, replayable stream of PRNG keys.

    Usage: one chain per (fold, purpose); `key(epoch, step)` is a pure
    function of the coordinates, so any step of any epoch is replayable
    without consuming a stateful iterator — the TPU-native replacement for
    the reference's `randomize()`-before-call transform pattern
    (koafusion/datasets/oai/_dataset.py:318-321).
    """

    def __init__(self, seed: int):
        import jax
        self._root = jax.random.key(seed)

    def key(self, *coords: int):
        import jax
        k = self._root
        for c in coords:
            k = jax.random.fold_in(k, c)
        return k
