"""Pallas ball query vs the jnp reference path — exact index equality
(interpret mode on CPU; the real-TPU twin run is part of /verify and the
bench crossover table in ops/grouping.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mods():
    import jax.numpy as jnp

    from papc_tpu.ops import grouping
    from papc_tpu.ops.pallas.ball_query import query_ball_point_pallas

    return jnp, grouping, query_ball_point_pallas


def _clouds(rng, B, N, S):
    xyz = rng.randn(B, N, 3).astype(np.float32)
    # queries are actual points (reference invariant: new_xyz ⊆ xyz)
    qi = rng.choice(N, size=(B, S))
    new_xyz = np.stack([xyz[b, qi[b]] for b in range(B)])
    return xyz, new_xyz


@pytest.mark.parametrize(
    "B,N,S,nsample,radius",
    [
        (2, 256, 64, 8, 0.5),  # mixed fill levels
        (1, 300, 70, 16, 0.3),  # non-aligned N/S (padding path)
        (2, 128, 32, 4, 3.0),  # every ball overfull
    ],
)
def test_matches_jnp_path(mods, rng, B, N, S, nsample, radius):
    jnp, grouping, pallas_bq = mods
    xyz, new_xyz = _clouds(rng, B, N, S)
    want = np.asarray(
        grouping.query_ball_point(
            radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)
        )
    )
    got = np.asarray(
        pallas_bq(
            radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_empty_ball_clamps(mods, rng):
    """Queries far from every point: jnp path clamps to N-1; the kernel
    must agree (degenerate case the reference can't hit)."""
    jnp, grouping, pallas_bq = mods
    xyz = rng.randn(1, 128, 3).astype(np.float32)
    far = np.full((1, 16, 3), 100.0, np.float32)
    want = np.asarray(
        grouping.query_ball_point(0.5, 8, jnp.asarray(xyz), jnp.asarray(far))
    )
    got = np.asarray(
        pallas_bq(0.5, 8, jnp.asarray(xyz), jnp.asarray(far), interpret=True)
    )
    np.testing.assert_array_equal(got, want)
