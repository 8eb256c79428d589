"""Kernel equivalence tests: papc_tpu.ops vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu import ops
from tests import oracles


def make_cloud(rng, B=2, N=64, C=3):
    return rng.randn(B, N, C).astype(np.float32)


class TestSquareDistance:
    def test_matches_oracle(self, rng):
        src = make_cloud(rng, 2, 33)
        dst = make_cloud(rng, 2, 17)
        got = np.asarray(ops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
        want = oracles.square_distance_np(src, dst)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_self_distance_zero_diag(self, rng):
        x = make_cloud(rng, 1, 16)
        d = np.asarray(ops.square_distance(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(np.diagonal(d[0]), 0.0, atol=1e-4)


class TestIndexPoints:
    def test_2d_idx(self, rng):
        pts = make_cloud(rng, 3, 20, 5)
        idx = rng.randint(0, 20, size=(3, 7))
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, oracles.index_points_np(pts, idx))

    def test_3d_idx(self, rng):
        pts = make_cloud(rng, 2, 20, 4)
        idx = rng.randint(0, 20, size=(2, 6, 8))
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)


class TestFPS:
    @pytest.mark.parametrize("npoint", [1, 8, 32])
    def test_matches_oracle(self, rng, npoint):
        xyz = make_cloud(rng, 2, 64)
        got = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), npoint, start_idx=0)
        )
        want = oracles.farthest_point_sample_np(xyz, npoint, start_idx=0)
        np.testing.assert_array_equal(got, want)

    def test_indices_unique(self, rng):
        xyz = make_cloud(rng, 1, 128)
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 64, start_idx=3)
        )
        assert len(np.unique(idx[0])) == 64

    def test_random_start_in_range(self, rng):
        xyz = make_cloud(rng, 4, 32)
        idx = np.asarray(
            ops.farthest_point_sample(
                jnp.asarray(xyz), 8, key=jax.random.PRNGKey(0)
            )
        )
        assert idx.min() >= 0 and idx.max() < 32

    def test_jit_compiles(self, rng):
        xyz = jnp.asarray(make_cloud(rng, 2, 64))
        f = jax.jit(lambda x: ops.farthest_point_sample(x, 16, start_idx=0))
        out = f(xyz)
        assert out.shape == (2, 16)


class TestQueryBallPoint:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng, 2, 64)
        centers = xyz[:, ::4, :]  # queries are a subset -> never empty
        got = np.asarray(
            ops.query_ball_point(
                0.9, 8, jnp.asarray(xyz), jnp.asarray(centers)
            )
        )
        want = oracles.query_ball_point_np(0.9, 8, xyz, centers)
        np.testing.assert_array_equal(got, want)

    def test_small_radius_self_only(self):
        # grid cloud with min spacing 1; radius 0.5 isolates each point.
        # (exact-zero self distance can't be asserted: the matmul
        # expansion leaves ~1e-7 noise — same as the reference impl)
        g = np.stack(
            np.meshgrid(np.arange(4.0), np.arange(4.0), np.arange(2.0)), -1
        ).reshape(1, 32, 3).astype(np.float32)
        got = np.asarray(
            ops.query_ball_point(0.5, 4, jnp.asarray(g), jnp.asarray(g))
        )
        # each ball contains exactly itself -> all slots = own index
        want = np.tile(np.arange(32)[None, :, None], (1, 1, 4))
        np.testing.assert_array_equal(got, want)


class TestKNN:
    def test_matches_argsort(self, rng):
        xyz = make_cloud(rng, 2, 40)
        q = make_cloud(rng, 2, 10)
        d, idx = ops.knn(3, jnp.asarray(xyz), jnp.asarray(q))
        full = oracles.square_distance_np(q, xyz)
        want_idx = np.argsort(full, axis=-1, kind="stable")[:, :, :3]
        want_d = np.take_along_axis(full, want_idx, axis=-1)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-4)
        # distances must match even if ties permute indices
        got_d_check = np.take_along_axis(full, np.asarray(idx), axis=-1)
        np.testing.assert_allclose(got_d_check, want_d, rtol=1e-3, atol=1e-4)


class TestThreeNNInterpolate:
    def test_matches_oracle(self, rng):
        xyz1 = make_cloud(rng, 2, 24)
        xyz2 = make_cloud(rng, 2, 9)
        feats = make_cloud(rng, 2, 9, 6)
        got = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(feats)
            )
        )
        want = oracles.three_nn_interpolate_np(xyz1, xyz2, feats)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestSampleAndGroup:
    def test_shapes_and_normalization(self, rng):
        xyz = jnp.asarray(make_cloud(rng, 2, 64))
        feats = jnp.asarray(make_cloud(rng, 2, 64, 7))
        new_xyz, new_points = ops.sample_and_group(16, 0.5, 8, xyz, feats)
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 3 + 7)
        # every grouped neighbor lies within the ball radius of its center
        rel = np.asarray(new_points[..., :3])
        dist = np.sqrt((rel**2).sum(-1))
        assert dist.max() <= 0.5 + 1e-4

    def test_group_all(self, rng):
        xyz = jnp.asarray(make_cloud(rng, 2, 32))
        feats = jnp.asarray(make_cloud(rng, 2, 32, 5))
        new_xyz, new_points = ops.sample_and_group_all(xyz, feats)
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 32, 8)
        np.testing.assert_array_equal(
            np.asarray(new_points[:, 0, :, :3]), np.asarray(xyz)
        )


class TestQueryBallPointTiled:
    def test_matches_untiled(self, rng):
        from papc_tpu.ops import query_ball_point_tiled

        xyz = jnp.asarray(make_cloud(rng, 2, 200))
        centers = xyz[:, ::4, :]  # S=50, not a multiple of the chunk
        want = np.asarray(ops.query_ball_point(0.9, 8, xyz, centers))
        got = np.asarray(
            query_ball_point_tiled(0.9, 8, xyz, centers, query_chunk=16)
        )
        np.testing.assert_array_equal(got, want)
