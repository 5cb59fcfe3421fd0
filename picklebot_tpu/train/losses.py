"""Losses and accuracy metrics (reference train.py:110-121, 217-221).

CE matches torch nn.CrossEntropyLoss (mean reduction, integer labels);
BCE matches nn.BCEWithLogitsLoss on float labels. Accuracy functions mirror
calculate_accuracy / calculate_accuracy_bce. All computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits (B, C) float, labels (B,) int -> scalar mean CE."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.mean(nll)


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits (B, 1) float, labels (B, 1) float -> scalar mean BCE."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|))
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def accuracy_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Count of argmax matches (reference calculate_accuracy)."""
    preds = jnp.argmax(logits, axis=-1)
    return jnp.sum(preds == labels.astype(preds.dtype))


def accuracy_bce(logits: jax.Array, labels: jax.Array,
                 threshold: float = 0.5) -> jax.Array:
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    preds = (probs >= threshold).astype(jnp.float32)
    return jnp.sum(preds == labels.astype(jnp.float32))


LOSSES = {
    "CE": (cross_entropy, accuracy_ce),
    "BCE": (bce_with_logits, accuracy_bce),
}


def prepare_labels(criterion: str, labels: jax.Array) -> jax.Array:
    """Reference label plumbing: CE squeezes to (B,) long (train.py:267),
    BCE keeps (B, 1) float (train.py:107)."""
    if criterion == "CE":
        return labels.reshape(-1).astype(jnp.int32)
    return labels.reshape(-1, 1).astype(jnp.float32)
