"""Pallas row scatter-add (gather backward) vs numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.ops.geometry import index_points
from papc_tpu.ops.pallas.scatter import scatter_rows_add_pallas


def _oracle(g, idx, n_rows):
    B, S, C = g.shape
    out = np.zeros((B, n_rows, C), np.float32)
    for b in range(B):
        for s in range(S):
            i = idx[b, s]
            if 0 <= i < n_rows:
                out[b, i] += g[b, s]
    return out


@pytest.mark.parametrize(
    "B,S,C,n_rows", [(2, 64, 8, 32), (3, 200, 131, 96), (1, 128, 3, 640)]
)
def test_scatter_matches_oracle(rng, B, S, C, n_rows):
    g = rng.randn(B, S, C).astype(np.float32)
    idx = rng.randint(0, n_rows, (B, S)).astype(np.int32)
    got = np.asarray(
        scatter_rows_add_pallas(
            jnp.asarray(g), jnp.asarray(idx), n_rows, interpret=True
        )
    )
    # atol floor: tile-partial summation order differs from the
    # sequential oracle, so near-cancelling sums carry f32 ulp noise
    np.testing.assert_allclose(
        got, _oracle(g, idx, n_rows), rtol=1e-5, atol=1e-6
    )


def test_scatter_ignores_padding_indices(rng):
    g = rng.randn(2, 32, 5).astype(np.float32)
    idx = np.full((2, 32), -1, np.int32)
    idx[0, :3] = [0, 2, 2]
    got = np.asarray(
        scatter_rows_add_pallas(
            jnp.asarray(g), jnp.asarray(idx), 16, interpret=True
        )
    )
    want = _oracle(g, idx, 16)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert np.all(got[1] == 0)


def test_scatter_duplicate_heavy(rng):
    """Ball-query style duplicates: many S rows hitting one target row."""
    g = rng.randn(1, 256, 16).astype(np.float32)
    idx = np.zeros((1, 256), np.int32)  # everything lands on row 0
    got = np.asarray(
        scatter_rows_add_pallas(
            jnp.asarray(g), jnp.asarray(idx), 8, interpret=True
        )
    )
    np.testing.assert_allclose(
        got[0, 0], g[0].sum(0), rtol=1e-5, atol=1e-5
    )


def test_index_points_grad_cpu_path(rng):
    """On CPU the plain XLA backward runs; establishes the oracle the
    TPU custom-VJP path is tested against on-chip."""
    pts = jnp.asarray(rng.randn(2, 32, 7), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 32, (2, 10, 4)), jnp.int32)
    w = jnp.asarray(rng.randn(2, 10, 4, 7), jnp.float32)

    def loss(p):
        return (index_points(p, idx) * w).sum()

    grad = np.asarray(jax.grad(loss)(pts))
    want = _oracle(
        np.asarray(w.reshape(2, 40, 7)),
        np.asarray(idx.reshape(2, 40)),
        32,
    )
    np.testing.assert_allclose(grad, want, rtol=1e-5, atol=1e-6)
