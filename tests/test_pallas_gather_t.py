"""Channel-sublane gather/scatter kernels vs numpy oracles.

These are the [B, C, M]-layout twins of index_points / the row scatter
(papc_tpu/ops/pallas/gather_t.py) — interpret mode on CPU, same
3-bf16-plane accumulation as the device kernel, tolerance ~2^-25 rel
(the documented contract; the one-hot products themselves are exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.ops.pallas.gather_t import (
    gather_cols,
    gather_cols_pallas,
    scatter_cols_add_pallas,
)


def _gather_np(src_t, idx):
    B, C, N = src_t.shape
    idx = np.clip(idx, 0, N - 1)
    out = np.stack([src_t[b][:, idx[b]] for b in range(B)])
    return out


def _scatter_np(g_t, idx, n_cols):
    B, C, M = g_t.shape
    out = np.zeros((B, C, n_cols), np.float32)
    for b in range(B):
        for m in range(M):
            j = idx[b, m]
            if 0 <= j < n_cols:
                out[b, :, j] += g_t[b, :, m]
    return out


@pytest.mark.parametrize("C,N,M", [(3, 64, 256), (131, 128, 384)])
def test_gather_cols_matches_oracle(C, N, M):
    rs = np.random.RandomState(0)
    src = rs.randn(2, C, N).astype(np.float32)
    idx = rs.randint(0, N, size=(2, M)).astype(np.int32)
    out = np.asarray(
        gather_cols_pallas(jnp.asarray(src), jnp.asarray(idx),
                           t=128, interpret=True)
    )
    ref = _gather_np(src, idx)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_gather_cols_clamps_oob():
    rs = np.random.RandomState(1)
    src = rs.randn(1, 5, 32).astype(np.float32)
    idx = np.array([[-3, 0, 31, 40, 7, 31, 2, 1]], np.int32)
    out = np.asarray(
        gather_cols_pallas(jnp.asarray(src), jnp.asarray(idx),
                           t=128, interpret=True)
    )
    ref = _gather_np(src, idx)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("C,M,n_cols", [(3, 256, 64), (131, 384, 128)])
def test_scatter_cols_matches_oracle(C, M, n_cols):
    rs = np.random.RandomState(2)
    g = rs.randn(2, C, M).astype(np.float32)
    idx = rs.randint(-1, n_cols, size=(2, M)).astype(np.int32)
    out = np.asarray(
        scatter_cols_add_pallas(
            jnp.asarray(g), jnp.asarray(idx), n_cols, t=128,
            interpret=True,
        )
    )
    ref = _scatter_np(g, idx, n_cols)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_gather_cols_grad_is_scatter():
    """The custom VJP must equal the dense-oracle jacobian-transpose:
    d/dsrc of sum(w * gather(src, idx)) == scatter(w, idx)."""
    rs = np.random.RandomState(3)
    B, C, N, M = 2, 6, 48, 96
    src = jnp.asarray(rs.randn(B, C, N).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, N, size=(B, M)).astype(np.int32))
    w = jnp.asarray(rs.randn(B, C, M).astype(np.float32))

    def f(s):
        return (gather_cols(s, idx, interpret=True) * w).sum()

    g = np.asarray(jax.grad(f)(src))
    ref = _scatter_np(np.asarray(w), np.asarray(idx), N)
    np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)


def test_gather_cols_matches_index_points_layout():
    """gather_cols(src_t, idx) == transpose(index_points(src, idx)) —
    the two layouts must agree on values."""
    from papc_tpu.ops.geometry import index_points

    rs = np.random.RandomState(4)
    B, N, C, S, K = 2, 64, 3, 16, 8
    src = rs.randn(B, N, C).astype(np.float32)
    idx = rs.randint(0, N, size=(B, S, K)).astype(np.int32)
    ref = np.asarray(
        index_points(jnp.asarray(src), jnp.asarray(idx))
    )  # [B, S, K, C]
    out = np.asarray(
        gather_cols(
            jnp.asarray(src.transpose(0, 2, 1)), jnp.asarray(idx),
            interpret=True,
        )
    )  # [B, C, S*K]
    np.testing.assert_allclose(
        out.reshape(B, C, S, K).transpose(0, 2, 3, 1), ref,
        rtol=1e-6, atol=1e-6,
    )
