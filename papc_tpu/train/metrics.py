"""Training metrics: top-1 accuracy and mean-IoU, mask-aware.

Reference parity: ``PAPC/train.py:67-76`` — ``paddle.metric.accuracy``
(top-1) for clas, ``paddle.fluid.layers.mean_iou`` for seg. mean_iou
averages IoU over classes whose union is non-zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Top-1 accuracy. logits ``[B, C]``, labels ``[B]``, mask ``[B]``."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)


def mean_iou(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean IoU over classes present (union > 0).

    logits ``[B, N, C]`` (or pre-argmaxed preds ``[B, N]``), labels
    ``[B, N]``, mask ``[B]`` batch-row validity.
    """
    if logits.ndim == labels.ndim + 1:
        preds = jnp.argmax(logits, axis=-1)
    else:
        preds = logits
    preds = preds.reshape(-1)
    labels = labels.reshape(-1)
    if mask is not None:
        # expand batch-row mask over points
        n_per = labels.size // mask.size
        valid = jnp.repeat(mask, n_per).astype(bool)
    else:
        valid = jnp.ones_like(labels, dtype=bool)

    cls = jnp.arange(num_classes)
    pred_hit = (preds[None, :] == cls[:, None]) & valid[None, :]
    label_hit = (labels[None, :] == cls[:, None]) & valid[None, :]
    intersection = jnp.sum(pred_hit & label_hit, axis=1).astype(jnp.float32)
    union = jnp.sum(pred_hit | label_hit, axis=1).astype(jnp.float32)
    present = union > 0
    iou = jnp.where(present, intersection / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1.0)


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Mean softmax CE with integer labels; ``mask`` zeroes padded rows.

    For seg, logits ``[B, N, C]`` / labels ``[B, N]`` — the mean runs over
    all valid points (reference: ``paddle.nn.CrossEntropyLoss`` default
    mean reduction).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    m = mask.astype(jnp.float32)
    while m.ndim < nll.ndim:  # [B] mask over [B, N] point losses
        m = m[..., None]
    m = jnp.broadcast_to(m, nll.shape)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
