"""Detection losses (jnp, jittable).

Reference parity: ``core/losses.py`` — the same family of anchorwise
weighted losses (weighted L2 / smooth-L1 localization; weighted sigmoid /
sigmoid-focal / softmax-focal / weighted-softmax / bootstrapped-sigmoid
classification) with identical weighting semantics, as pure functions
over ``[B, A, C]`` tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy_with_logits(logits, labels):
    """Numerically-stable per-element sigmoid CE
    (reference ``losses.py:185-189``)."""
    return (
        jnp.clip(logits, 0, None)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softmax_cross_entropy_with_logits(logits, labels):
    """Per-row softmax CE against one-hot (or soft) labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * logp, axis=-1)


def weighted_l2_localization_loss(pred, target, weights, code_weights=None):
    """[B, A, C] → [B, A] (reference :98-133)."""
    diff = pred - target
    if code_weights is not None:
        diff = jnp.asarray(code_weights)[None, None, :] * diff
    weighted = diff * weights[..., None]
    return jnp.sum(0.5 * weighted * weighted, axis=2)


def weighted_smooth_l1_localization_loss(
    pred, target, weights=None, sigma=3.0, code_weights=None, codewise=True
):
    """[B, A, C] → [B, A, C] (codewise) or [B, A] (reference :134-183)."""
    diff = pred - target
    if code_weights is not None:
        diff = jnp.asarray(code_weights)[None, None, :] * diff
    abs_diff = jnp.abs(diff)
    cut = 1.0 / (sigma**2)
    lt = (abs_diff <= cut).astype(diff.dtype)
    loss = (
        lt * 0.5 * jnp.square(abs_diff * sigma)
        + (abs_diff - 0.5 * cut) * (1.0 - lt)
    )
    if codewise:
        if weights is not None:
            loss = loss * weights[..., None]
        return loss
    loss = jnp.sum(loss, axis=2)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_sigmoid_classification_loss(pred, target, weights):
    """[B, A, C] → [B, A, C] (reference :202-231)."""
    return sigmoid_cross_entropy_with_logits(pred, target) * weights[..., None]


def sigmoid_focal_classification_loss(
    pred, target, weights, gamma=2.0, alpha=0.25
):
    """Sigmoid focal loss, [B, A, C] → [B, A, C] (reference :234-292)."""
    ce = sigmoid_cross_entropy_with_logits(pred, target)
    prob = jax.nn.sigmoid(pred)
    p_t = target * prob + (1 - target) * (1 - prob)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    if alpha is not None:
        alpha_w = target * alpha + (1 - target) * (1 - alpha)
    else:
        alpha_w = 1.0
    return modulating * alpha_w * ce * weights[..., None]


def softmax_focal_classification_loss(
    pred, target, weights, gamma=2.0, alpha=0.25
):
    """Softmax focal loss (reference :295-355). ``target`` one-hot with
    class 0 = background (alpha swaps for background rows)."""
    ce = softmax_cross_entropy_with_logits(pred, target)[..., None] * target
    prob = jax.nn.softmax(pred, axis=-1)
    p_t = target * prob + (1 - target) * (1 - prob)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    if alpha is not None:
        alpha_w = jnp.where(target[..., 0] == 1, 1 - alpha, alpha)[..., None]
    else:
        alpha_w = 1.0
    return modulating * alpha_w * ce * weights[..., None]


def weighted_softmax_classification_loss(
    pred, target, weights, logit_scale=1.0
):
    """[B, A, C] → [B, A] (reference :356-391). Used for the direction
    classifier."""
    ce = softmax_cross_entropy_with_logits(pred / logit_scale, target)
    return ce * weights


def bootstrapped_sigmoid_classification_loss(
    pred, target, weights, alpha, bootstrap_type="soft"
):
    """Bootstrapped sigmoid CE (reference :394-449)."""
    if bootstrap_type == "soft":
        boot = alpha * target + (1.0 - alpha) * jax.nn.sigmoid(pred)
    else:
        boot = alpha * target + (1.0 - alpha) * (
            jax.nn.sigmoid(pred) > 0.5
        ).astype(pred.dtype)
    return (
        sigmoid_cross_entropy_with_logits(pred, boot) * weights[..., None]
    )
