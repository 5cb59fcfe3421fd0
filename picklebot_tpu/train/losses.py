"""Losses and accuracy metrics (reference train.py:110-121, 217-221).

CE matches torch nn.CrossEntropyLoss (mean reduction, integer labels);
BCE matches nn.BCEWithLogitsLoss on float labels. Accuracy functions mirror
calculate_accuracy / calculate_accuracy_bce. All computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_per_sample(logits: jax.Array,
                             labels: jax.Array) -> jax.Array:
    """logits (B, C) float, labels (B,) int -> (B,) per-sample NLL."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits (B, C) float, labels (B,) int -> scalar mean CE."""
    return jnp.mean(cross_entropy_per_sample(logits, labels))


def smoothed_cross_entropy(eps: float):
    """Label-smoothed CE (training extension; the reference trains on hard
    labels only, train.py:217-221): target = (1-eps)*onehot + eps/C.
    Matches torch nn.CrossEntropyLoss(label_smoothing=eps):
    loss = (1-eps)*NLL + eps*mean_c(-log p_c)."""
    def loss(logits, labels):
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        uniform = -jnp.mean(logp, axis=-1)
        return jnp.mean((1.0 - eps) * nll + eps * uniform)

    return loss


def smoothed_bce(eps: float):
    """Label-smoothed BCEWithLogits: y -> y*(1-eps) + eps/2 (torch
    convention for binary smoothing)."""
    def loss(logits, labels):
        labels = labels.astype(jnp.float32) * (1.0 - eps) + eps / 2.0
        return bce_with_logits(logits, labels)

    return loss


def bce_per_sample(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits (B, 1) float, labels (B, 1) float -> (B,) per-sample BCE."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|))
    per = (jnp.maximum(logits, 0) - logits * labels +
           jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return per[:, 0]


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits (B, 1) float, labels (B, 1) float -> scalar mean BCE."""
    return jnp.mean(bce_per_sample(logits, labels))


def correct_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(B,) 0/1 per-sample argmax matches (reference calculate_accuracy)."""
    preds = jnp.argmax(logits, axis=-1)
    return (preds == labels.astype(preds.dtype)).astype(jnp.float32)


def accuracy_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Count of argmax matches (reference calculate_accuracy)."""
    return jnp.sum(correct_ce(logits, labels))


def correct_bce(logits: jax.Array, labels: jax.Array,
                threshold: float = 0.5) -> jax.Array:
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    preds = (probs >= threshold).astype(jnp.float32)
    return (preds == labels.astype(jnp.float32)).astype(jnp.float32)[:, 0]


def accuracy_bce(logits: jax.Array, labels: jax.Array,
                 threshold: float = 0.5) -> jax.Array:
    return jnp.sum(correct_bce(logits, labels, threshold))


LOSSES = {
    "CE": (cross_entropy, accuracy_ce),
    "BCE": (bce_with_logits, accuracy_bce),
}

# per-sample variants (loss (B,), correct (B,)) for masked/padded eval
LOSSES_PER_SAMPLE = {
    "CE": (cross_entropy_per_sample, correct_ce),
    "BCE": (bce_per_sample, correct_bce),
}


def prepare_labels(criterion: str, labels: jax.Array) -> jax.Array:
    """Reference label plumbing: CE squeezes to (B,) long (train.py:267),
    BCE keeps (B, 1) float (train.py:107)."""
    if criterion == "CE":
        return labels.reshape(-1).astype(jnp.int32)
    return labels.reshape(-1, 1).astype(jnp.float32)
