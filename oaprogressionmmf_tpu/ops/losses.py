"""Classification losses (focal / cross-entropy), jittable.

Semantics match koafusion/various/_losses.py:13-117: CE over logits with
optional class weights; focal loss = (1-p_t)^gamma * CE with mean/sum
reduction (gamma=2 default).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       class_weight=None, reduction: str = "mean"):
    """Softmax CE over logits (B, C) and int targets (B,)."""
    return make_cross_entropy(num_classes=logits.shape[-1],
                              class_weight=class_weight,
                              reduction=reduction)(logits, targets)


def _log_softmax_pick(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    return jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


def make_cross_entropy(num_classes: int, class_weight=None,
                       reduction: str = "mean", **_unused):
    """CE factory matching the reference's CrossEntropyLoss wrapper."""
    cw = (jnp.asarray(class_weight, jnp.float32)
          if class_weight is not None else None)

    def loss_fn(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logpt = _log_softmax_pick(input, target)
        nll = -logpt
        if cw is not None:
            w = cw[target]
            # torch weighted-mean semantics: sum(w*nll)/sum(w)
            if reduction == "mean":
                return jnp.sum(w * nll) / jnp.sum(w)
            return jnp.sum(w * nll)
        return jnp.mean(nll) if reduction == "mean" else jnp.sum(nll)

    return loss_fn


def make_focal(num_classes: int = 2, gamma: float = 2.0, class_weight=None,
               reduction: str = "mean", **_unused):
    """Focal loss factory — (1-pt)^gamma * CE (koafusion _losses.py:89-108)."""
    if reduction not in ("mean", "sum"):
        raise ValueError("Unknown `reduction` value")
    cw = (jnp.asarray(class_weight, jnp.float32)
          if class_weight is not None else None)

    def loss_fn(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logpt = _log_softmax_pick(input, target)
        if cw is not None:
            logpt = logpt * cw[target]
        pt = jnp.exp(logpt)
        loss = -((1.0 - pt) ** gamma) * logpt
        return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)

    return loss_fn


def focal_loss(logits, targets, gamma: float = 2.0, reduction: str = "mean"):
    return make_focal(gamma=gamma, reduction=reduction)(logits, targets)


def make_bce_with_logits(**_unused):
    def loss_fn(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(optax.sigmoid_binary_cross_entropy(
            input, target.astype(jnp.float32)))
    return loss_fn


def _loss_factory(kind):
    def build(num_classes: int = 2, **params):
        params.pop("batch_avg", None)
        params.pop("batch_weight", None)
        params.pop("class_avg", None)
        return kind(num_classes=num_classes, **params)
    return build


dict_losses = {
    "bce_wlogits_loss": _loss_factory(lambda num_classes=2, **p: make_bce_with_logits(**p)),
    "CrossEntropyLoss": _loss_factory(make_cross_entropy),
    "FocalLoss": _loss_factory(make_focal),
}
