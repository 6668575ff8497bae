"""Masked losses and metrics (reference models/base_gattn.py semantics).

All take dense one/multi-hot ``labels (N, C)`` and a node ``mask (N,)``; the
mask is mean-normalized exactly as the reference (tkipf/gcn lineage):
``mask = mask / mean(mask)`` then a plain mean over all nodes — equivalent to
the mean over masked nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_softmax_cross_entropy(logits: jax.Array, labels: jax.Array,
                                 mask: jax.Array) -> jax.Array:
    """Reference base_gattn.py:41-48."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(labels * logp, axis=-1)  # (N,)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)  # empty mask → 0, not NaN
    return jnp.mean(loss * m)


def masked_sigmoid_cross_entropy(logits: jax.Array, labels: jax.Array,
                                 mask: jax.Array) -> jax.Array:
    """Multi-label (PPI) loss; reference base_gattn.py:50-59."""
    labels = labels.astype(jnp.float32)
    # stable sigmoid CE: max(x,0) - x*z + log1p(exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = jnp.mean(loss, axis=-1)  # (N,)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)  # empty mask → 0, not NaN
    return jnp.mean(loss * m)


def masked_accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference base_gattn.py:61-69."""
    correct = (jnp.argmax(logits, axis=-1) == jnp.argmax(labels, axis=-1))
    correct = correct.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)  # empty mask → 0, not NaN
    return jnp.mean(correct * m)


def micro_f1(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Multi-label micro-F1 via integer TP/FP/FN counts; reference
    base_gattn.py:71-94 (sigmoid → round → count)."""
    pred = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.int32)
    lab = labels.astype(jnp.int32)
    m = mask.astype(jnp.int32)[:, None]
    tp = jnp.sum(pred * lab * m)
    fp = jnp.sum(pred * (1 - lab) * m)
    fn = jnp.sum((1 - pred) * lab * m)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    return (2 * precision * recall / jnp.maximum(precision + recall, 1e-12)).astype(
        jnp.float32)


def l2_regularizer(params, coef: float) -> jax.Array:
    """Global L2 over ALL trainable parameters.

    The reference intends to exempt biases but its name filter never matches
    (base_gattn.py:15-16 compares full variable names against bare strings),
    so the effective behavior — replicated here — is L2 on everything:
    ``coef * sum(0.5 * ||v||^2)`` (tf.nn.l2_loss convention).
    """
    leaves = jax.tree_util.tree_leaves(params)
    return coef * 0.5 * sum(jnp.sum(jnp.square(p)) for p in leaves)


def confusion_matrix(logits: jax.Array, label_ids: jax.Array,
                     n_classes: int) -> jax.Array:
    """(C, C) confusion matrix, rows = true class, cols = argmax prediction;
    reference ``BaseGAttN.confmat`` (base_gattn.py:33-35)."""
    preds = jnp.argmax(logits, axis=-1)
    onehot_true = jax.nn.one_hot(label_ids, n_classes, dtype=jnp.int32)
    onehot_pred = jax.nn.one_hot(preds, n_classes, dtype=jnp.int32)
    return onehot_true.T @ onehot_pred


def class_weighted_cross_entropy(logits: jax.Array, label_ids: jax.Array,
                                 n_classes: int, class_weights: jax.Array) -> jax.Array:
    """Integer-label CE scaled by per-class weights; reference
    base_gattn.py:5-10 (``BaseGAttN.loss``)."""
    onehot = jax.nn.one_hot(label_ids, n_classes)
    sample_w = jnp.sum(onehot * class_weights, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, label_ids[:, None], axis=-1)[:, 0]
    return jnp.mean(ce * sample_w)
