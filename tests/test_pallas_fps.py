"""Pallas FPS kernel vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.ops.pallas.fps import farthest_point_sample_pallas
from papc_tpu.ops.sampling import farthest_point_sample


@pytest.mark.parametrize("npoint", [1, 8, 64])
def test_matches_jnp_reference(rng, npoint):
    xyz = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, npoint, start_idx=0))
    got = np.asarray(
        farthest_point_sample_pallas(xyz, npoint, 0, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_start_idx_respected(rng):
    xyz = jnp.asarray(rng.randn(3, 64, 3), jnp.float32)
    got = np.asarray(
        farthest_point_sample_pallas(xyz, 4, 7, interpret=True)
    )
    np.testing.assert_array_equal(got[:, 0], [7, 7, 7])
    want = np.asarray(farthest_point_sample(xyz, 4, start_idx=7))
    np.testing.assert_array_equal(got, want)


def test_batch_blocking_and_padding(rng, monkeypatch):
    """Multi-program grid with a ragged final block: B=5 rows in blocks
    of 2 (grid=3, one padded row) must equal the unblocked result."""
    from papc_tpu.ops.pallas import fps as fps_mod

    monkeypatch.setattr(fps_mod, "_batch_block", lambda B, N: 2)
    xyz = jnp.asarray(rng.randn(5, 96, 3), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, 16, start_idx=0))
    got = np.asarray(
        fps_mod.farthest_point_sample_pallas(xyz, 16, 0, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_per_item_start_idx(rng):
    """Vector start_idx (the key=... path) round-trips per row."""
    xyz = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
    starts = jnp.asarray([3, 11, 0, 63], jnp.int32)
    got = np.asarray(
        farthest_point_sample_pallas(xyz, 8, starts, interpret=True)
    )
    np.testing.assert_array_equal(got[:, 0], np.asarray(starts))
    want = np.asarray(farthest_point_sample(xyz, 8, start_idx=starts))
    np.testing.assert_array_equal(got, want)


def test_backend_dispatch(rng):
    """backend='xla' forced path equals the default on CPU; the auto rule
    only picks pallas on TPU (so CPU CI never hits interpret mode)."""
    import jax

    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    a = np.asarray(farthest_point_sample(xyz, 8, start_idx=0))
    b = np.asarray(
        farthest_point_sample(xyz, 8, start_idx=0, backend="xla")
    )
    np.testing.assert_array_equal(a, b)
    assert jax.default_backend() != "tpu"  # conftest forces CPU
