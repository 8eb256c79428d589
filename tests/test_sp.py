"""Point-axis sharding (SP) vs single-device kernels on the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.ops import farthest_point_sample, query_ball_point
from papc_tpu.parallel.mesh import make_mesh
from papc_tpu.parallel.sp import sharded_ball_query, sharded_fps


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(n_data=8)


def test_sharded_ball_query_matches(rng, mesh):
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    queries = xyz[:, ::8, :]
    want = np.asarray(query_ball_point(0.9, 8, xyz, queries))
    got = np.asarray(
        sharded_ball_query(0.9, 8, xyz, queries, mesh)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_ball_query_small_nsample(rng, mesh):
    xyz = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
    queries = xyz[:, ::16, :]
    want = np.asarray(query_ball_point(1.5, 4, xyz, queries))
    got = np.asarray(sharded_ball_query(1.5, 4, xyz, queries, mesh))
    np.testing.assert_array_equal(got, want)


def test_sharded_fps_matches(rng, mesh):
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, 16, start_idx=0))
    got = np.asarray(sharded_fps(xyz, 16, mesh, start_idx=0))
    np.testing.assert_array_equal(got, want)


def test_sharded_fps_full_sample(rng, mesh):
    xyz = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
    got = np.asarray(sharded_fps(xyz, 32, mesh, start_idx=3))
    assert len(np.unique(got[0])) == 32


@pytest.fixture(scope="module")
def dp_sp_mesh():
    """4 (data) x 2 (model) mesh: batch over data, points over model."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    return Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )


def test_sharded_fps_dp_sp_composition(rng, dp_sp_mesh):
    """batch_axis='data' + axis='model': same result as single-device,
    with the batch split across the data axis."""
    xyz = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, 16, start_idx=0))
    got = np.asarray(
        sharded_fps(
            xyz, 16, dp_sp_mesh, axis="model", start_idx=0,
            batch_axis="data",
        )
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_ball_query_dp_sp_composition(rng, dp_sp_mesh):
    xyz = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
    queries = xyz[:, ::8, :]
    want = np.asarray(query_ball_point(0.9, 8, xyz, queries))
    got = np.asarray(
        sharded_ball_query(
            0.9, 8, xyz, queries, dp_sp_mesh, axis="model",
            batch_axis="data",
        )
    )
    np.testing.assert_array_equal(got, want)
