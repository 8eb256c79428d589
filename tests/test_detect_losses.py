"""Detection loss unit tests against hand-computed values."""

import jax.numpy as jnp
import numpy as np

from papc_tpu.detect import losses as L
from papc_tpu.detect.detector import get_pos_neg_loss


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_sigmoid_ce_matches_naive():
    logits = jnp.asarray([[-3.0, 0.0, 2.0]])
    labels = jnp.asarray([[0.0, 1.0, 1.0]])
    got = np.asarray(
        L.sigmoid_cross_entropy_with_logits(logits, labels)
    )[0]
    p = sigmoid(np.asarray(logits)[0])
    want = -(
        np.asarray(labels)[0] * np.log(p)
        + (1 - np.asarray(labels)[0]) * np.log(1 - p)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_branches():
    # sigma=3 -> cutoff 1/9; below: 0.5*(3d)^2, above: d - 0.5/9
    pred = jnp.asarray([[[0.05, 2.0]]])
    target = jnp.zeros((1, 1, 2))
    w = jnp.ones((1, 1))
    got = np.asarray(
        L.weighted_smooth_l1_localization_loss(pred, target, w, sigma=3.0)
    )[0, 0]
    np.testing.assert_allclose(
        got, [0.5 * (0.05 * 3) ** 2, 2.0 - 0.5 / 9], rtol=1e-5
    )


def test_smooth_l1_code_weights_scale_diff():
    pred = jnp.asarray([[[2.0, 2.0]]])
    target = jnp.zeros((1, 1, 2))
    w = jnp.ones((1, 1))
    got = np.asarray(
        L.weighted_smooth_l1_localization_loss(
            pred, target, w, sigma=3.0, code_weights=[1.0, 0.0]
        )
    )[0, 0]
    assert got[1] == 0.0 and got[0] > 0


def test_focal_loss_downweights_easy():
    # easy positive (high logit) must get much smaller loss than a hard one
    easy = jnp.asarray([[[6.0]]])
    hard = jnp.asarray([[[-2.0]]])
    target = jnp.ones((1, 1, 1))
    w = jnp.ones((1, 1))
    le = float(
        L.sigmoid_focal_classification_loss(easy, target, w).sum()
    )
    lh = float(
        L.sigmoid_focal_classification_loss(hard, target, w).sum()
    )
    # focal modulation: easy example suppressed far below plain CE ratio
    assert lh / max(le, 1e-12) > 1000


def test_focal_alpha_balance():
    logits = jnp.zeros((1, 1, 1))
    w = jnp.ones((1, 1))
    pos = float(
        L.sigmoid_focal_classification_loss(
            logits, jnp.ones((1, 1, 1)), w, alpha=0.25
        ).sum()
    )
    neg = float(
        L.sigmoid_focal_classification_loss(
            logits, jnp.zeros((1, 1, 1)), w, alpha=0.25
        ).sum()
    )
    # same CE/modulation; only alpha differs: pos/neg == 0.25/0.75
    np.testing.assert_allclose(pos / neg, 1 / 3, rtol=1e-5)


def test_weighted_softmax_matches_ce():
    logits = jnp.asarray([[[2.0, -1.0]]])
    target = jnp.asarray([[[1.0, 0.0]]])
    w = jnp.full((1, 1), 2.0)
    got = float(
        L.weighted_softmax_classification_loss(logits, target, w)[0, 0]
    )
    z = np.asarray(logits)[0, 0]
    want = 2.0 * -(z[0] - np.log(np.exp(z).sum()))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bootstrapped_soft_interpolates_target():
    logits = jnp.asarray([[[4.0]]])
    target = jnp.ones((1, 1, 1))
    w = jnp.ones((1, 1))
    # alpha=1 -> plain CE on given target
    full = float(
        L.bootstrapped_sigmoid_classification_loss(
            logits, target, w, alpha=1.0
        ).sum()
    )
    ce = float(
        L.sigmoid_cross_entropy_with_logits(logits, target).sum()
    )
    np.testing.assert_allclose(full, ce, rtol=1e-6)
    # alpha=0 -> target == sigmoid(logit): CE vs its own prediction
    self_t = float(
        L.bootstrapped_sigmoid_classification_loss(
            logits, target, w, alpha=0.0
        ).sum()
    )
    p = sigmoid(4.0)
    want = -(p * np.log(p) + (1 - p) * np.log(1 - p))
    np.testing.assert_allclose(self_t, want, rtol=1e-5)


def test_weighted_l2():
    pred = jnp.asarray([[[3.0, 4.0]]])
    target = jnp.zeros((1, 1, 2))
    w = jnp.ones((1, 1))
    got = float(L.weighted_l2_localization_loss(pred, target, w)[0, 0])
    np.testing.assert_allclose(got, 0.5 * (9 + 16), rtol=1e-6)


def test_get_pos_neg_loss_split():
    cls_loss = jnp.asarray([[[1.0], [2.0], [4.0]]])  # [1, 3, 1]
    labels = jnp.asarray([[1, 0, -1]])
    pos, neg = get_pos_neg_loss(cls_loss, labels)
    assert float(pos) == 1.0
    assert float(neg) == 2.0
