"""Tests for running metrics, mixed precision, profiling utils."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from papc_tpu.train.precision import (
    bf16_compute,
    cast_floating,
    dynamic_loss_scale,
)
from papc_tpu.train.running_metrics import (
    AccuracyState,
    PrecisionRecallState,
    ScalarState,
)
from papc_tpu.utils.profiling import StepTimer
from papc_tpu.utils.progress import progress_bar_iter


def test_scalar_running_mean():
    s = ScalarState.create()
    for v in (1.0, 2.0, 3.0):
        s = s.update(jnp.asarray(v))
    assert float(s.value) == 2.0


def test_accuracy_state():
    s = AccuracyState.create()
    labels = jnp.asarray([[1, 0, -1, 1]])
    # logits: 1 class, encode_background_as_zeros
    preds = jnp.asarray([[[3.0], [-3.0], [3.0], [-3.0]]])
    s = s.update(labels, preds)
    # anchor0: score>0.5 pred 1 == 1 ✓; anchor1: pred 0 == 0 ✓;
    # anchor2: ignored (weight 0); anchor3: pred 0 != 1 ✗
    assert abs(float(s.value) - 2.0 / 3.0) < 1e-6


def test_precision_recall_state():
    s = PrecisionRecallState.create(thresholds=(0.5,))
    labels = jnp.asarray([[1, 0, 1, 0]])
    preds = jnp.asarray([[[3.0], [3.0], [-3.0], [-3.0]]])
    s = s.update(labels, preds)
    # tp=1 (a0), fp=1 (a1), fn=1 (a2), tn=1 (a3)
    assert float(s.precision[0]) == 0.5
    assert float(s.recall[0]) == 0.5


def test_cast_and_bf16_compute():
    params = {"w": jnp.ones((4, 4)), "step": jnp.asarray(3)}
    half = cast_floating(params, jnp.bfloat16)
    assert half["w"].dtype == jnp.bfloat16
    assert half["step"].dtype == params["step"].dtype

    float_params = {"w": jnp.ones((4, 4))}

    def loss(p, x):
        return jnp.sum(p["w"].astype(jnp.float32) @ x)

    g = jax.grad(bf16_compute(loss))(float_params, jnp.ones((4, 2)))
    assert g["w"].dtype == jnp.float32  # grads land in param dtype
    assert bool(jnp.isfinite(g["w"]).all())


def test_dynamic_loss_scale_skips_nonfinite():
    tx = dynamic_loss_scale(init_scale=8.0, growth_interval=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    # finite grads: unscaled by 8
    g = {"w": jnp.asarray([8.0, 16.0, 24.0])}
    out, state = tx.update(g, state)
    np.testing.assert_allclose(np.asarray(out["w"]), [1, 2, 3])
    # non-finite: zeroed update + scale backoff
    g_bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
    out, state = tx.update(g_bad, state)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    assert float(state.scale) == 4.0
    assert int(state.good_steps) == 0


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((8, 8))
    t.start()
    y = x @ x
    dt = t.stop(y)
    assert dt >= 0 and t.count == 1


def test_progress_bar():
    buf = io.StringIO()
    out = list(progress_bar_iter(range(5), out=buf))
    assert out == list(range(5))
    assert "5/5" in buf.getvalue()
