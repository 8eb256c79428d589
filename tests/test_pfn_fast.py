"""Transposed BN-folded PFN (detect/pfn_fast.py) vs the classic
PillarFeatureNet: outputs, running-stat updates, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.detect.model import PillarFeatureNet
from papc_tpu.detect.pfn_fast import pfn_forward_t

KEY = jax.random.PRNGKey(0)
VOXEL_SIZE = (0.16, 0.16, 4.0)
PC_RANGE = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
NY, NX = 496, 432


def _fixture(with_distance=False, B=2, V=256, P=16, D=4, seed=0):
    """Realistic-scale pillars (KITTI ranges) to stress the covariance
    path's numerical stability: x in [0, 69], y in [-40, 40]."""
    rng = np.random.RandomState(seed)
    coords = np.stack(
        [
            np.zeros((B, V), np.int32),
            rng.randint(0, NY, size=(B, V)),
            rng.randint(0, NX, size=(B, V)),
        ],
        axis=-1,
    )
    num_points = rng.randint(1, P + 1, size=(B, V)).astype(np.int32)
    px = coords[..., 2] * VOXEL_SIZE[0] + VOXEL_SIZE[0] / 2 + PC_RANGE[0]
    py = coords[..., 1] * VOXEL_SIZE[1] + VOXEL_SIZE[1] / 2 + PC_RANGE[1]
    voxels = np.zeros((B, V, P, D), np.float32)
    voxels[..., 0] = px[..., None] + rng.randn(B, V, P) * 0.05
    voxels[..., 1] = py[..., None] + rng.randn(B, V, P) * 0.05
    voxels[..., 2] = rng.uniform(-3, 1, size=(B, V, P))
    voxels[..., 3:] = rng.rand(B, V, P, D - 3)
    slot = np.arange(P)[None, None, :]
    voxels *= (slot < num_points[..., None])[..., None]
    pfn = PillarFeatureNet(
        num_filters=(64,),
        voxel_size=VOXEL_SIZE,
        pc_range=PC_RANGE,
        with_distance=with_distance,
    )
    variables = pfn.init(
        KEY,
        jnp.asarray(voxels),
        jnp.asarray(num_points),
        jnp.asarray(coords),
        train=False,
    )
    return pfn, variables, voxels, num_points, coords


def _fast_args(variables, voxels, num_points, coords):
    p = variables["params"]["PFNLayer_0"]
    s = variables["batch_stats"]["PFNLayer_0"]["BatchNorm_0"]
    return dict(
        kernel=p["Dense_0"]["kernel"],
        scale=p["BatchNorm_0"]["scale"],
        bias=p["BatchNorm_0"]["bias"],
        running=(s["mean"], s["var"]),
        voxels_t=jnp.asarray(voxels).transpose(0, 3, 1, 2),
        num_points=jnp.asarray(num_points),
        coords=jnp.asarray(coords),
    )


@pytest.mark.parametrize("with_distance", [False, True])
@pytest.mark.parametrize("train", [True, False])
def test_pfn_fast_matches_classic(with_distance, train):
    pfn, variables, voxels, num_points, coords = _fixture(with_distance)
    classic, mut = pfn.apply(
        variables,
        jnp.asarray(voxels),
        jnp.asarray(num_points),
        jnp.asarray(coords),
        train=train,
        mutable=["batch_stats"],
    )
    args = _fast_args(variables, voxels, num_points, coords)
    out, new_running = pfn_forward_t(
        voxel_size=VOXEL_SIZE,
        pc_range=PC_RANGE,
        with_distance=with_distance,
        train=train,
        **args,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(classic), rtol=1e-4, atol=1e-5
    )
    if train:
        bn = mut["batch_stats"]["PFNLayer_0"]["BatchNorm_0"]
        np.testing.assert_allclose(
            np.asarray(new_running[0]), np.asarray(bn["mean"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_running[1]), np.asarray(bn["var"]),
            rtol=1e-3, atol=1e-6,
        )
    else:
        assert new_running[0] is args["running"][0]


def test_pfn_fast_gradients_match_classic():
    pfn, variables, voxels, num_points, coords = _fixture()
    args = _fast_args(variables, voxels, num_points, coords)
    cotangent = np.random.RandomState(1).randn(2, 256, 64).astype(
        np.float32
    )

    def classic_loss(params):
        out, _ = pfn.apply(
            {
                "params": params,
                "batch_stats": variables["batch_stats"],
            },
            jnp.asarray(voxels),
            jnp.asarray(num_points),
            jnp.asarray(coords),
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * cotangent)

    def fast_loss(triple):
        kernel, scale, bias = triple
        out, _ = pfn_forward_t(
            kernel,
            scale,
            bias,
            args["running"],
            args["voxels_t"],
            args["num_points"],
            args["coords"],
            voxel_size=VOXEL_SIZE,
            pc_range=PC_RANGE,
            train=True,
        )
        return jnp.sum(out * cotangent)

    g_classic = jax.grad(classic_loss)(variables["params"])[
        "PFNLayer_0"
    ]
    g_fast = jax.grad(fast_loss)(
        (args["kernel"], args["scale"], args["bias"])
    )
    np.testing.assert_allclose(
        np.asarray(g_fast[0]),
        np.asarray(g_classic["Dense_0"]["kernel"]),
        rtol=2e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_fast[1]),
        np.asarray(g_classic["BatchNorm_0"]["scale"]),
        rtol=2e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_fast[2]),
        np.asarray(g_classic["BatchNorm_0"]["bias"]),
        rtol=2e-3,
        atol=1e-4,
    )


@pytest.mark.parametrize("with_distance", [False, True])
@pytest.mark.parametrize("train", [True, False])
def test_pfn_flat_matches_classic(with_distance, train):
    """pfn_forward_flat (compute on real points + segment max) vs the
    classic padded-slot PillarFeatureNet: exact semantics, including
    the BN population (all B*V*P slots) and the padded-slot relu(b')
    max floor."""
    from papc_tpu.detect.pfn_fast import (
        flatten_pillars,
        pfn_forward_flat,
    )

    P = 16
    pfn, variables, voxels, num_points, coords = _fixture(
        with_distance, P=P, seed=3
    )
    # make some pillars FULL (count == P) to hit the no-padding branch
    num_points[0, :10] = P
    slot = np.arange(P)[None, None, :]
    mask = (slot < num_points[..., None])[..., None]
    voxels = voxels * 0 + voxels  # copy
    voxels = np.where(mask, voxels, 0.0).astype(np.float32)
    # ...and one empty pillar
    num_points[1, 0] = 0
    voxels[1, 0] = 0.0

    classic, mut = pfn.apply(
        variables,
        jnp.asarray(voxels),
        jnp.asarray(num_points),
        jnp.asarray(coords),
        train=train,
        mutable=["batch_stats"],
    )
    args = _fast_args(variables, voxels, num_points, coords)
    points, owner = flatten_pillars(voxels, num_points, coords)
    out, new_running = pfn_forward_flat(
        args["kernel"],
        args["scale"],
        args["bias"],
        args["running"],
        jnp.asarray(points),
        jnp.asarray(owner),
        jnp.asarray(num_points),
        jnp.asarray(coords),
        P,
        voxel_size=VOXEL_SIZE,
        pc_range=PC_RANGE,
        with_distance=with_distance,
        train=train,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(classic), rtol=1e-4, atol=1e-5
    )
    if train:
        bn = mut["batch_stats"]["PFNLayer_0"]["BatchNorm_0"]
        np.testing.assert_allclose(
            np.asarray(new_running[0]), np.asarray(bn["mean"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_running[1]), np.asarray(bn["var"]),
            rtol=1e-3, atol=1e-6,
        )


def test_pfn_flat_sorted_rows_exact():
    """FLAT_ROWS_SORTED=True (per-sample dump slot + sorted-scatter
    promises) is bit-identical to the default row space — outputs,
    running stats, and input/param grads — on sorted flat inputs
    (flatten_pillars emits voxel-major order by construction)."""
    import papc_tpu.detect.pfn_fast as PF

    P = 16
    pfn, variables, voxels, num_points, coords = _fixture(
        False, P=P, seed=11
    )
    num_points[1, 0] = 0
    voxels[1, 0] = 0.0
    args = _fast_args(variables, voxels, num_points, coords)
    points, owner = PF.flatten_pillars(voxels, num_points, coords)

    def run(train):
        def f(kernel, pts):
            out, new_running = PF.pfn_forward_flat(
                kernel, args["scale"], args["bias"], args["running"],
                pts, jnp.asarray(owner), jnp.asarray(num_points),
                jnp.asarray(coords), P,
                voxel_size=VOXEL_SIZE, pc_range=PC_RANGE,
                train=train,
            )
            return jnp.sum(jnp.sin(out)), (out, new_running)

        (loss, (out, nr)), g = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True
        )(args["kernel"], jnp.asarray(points))
        return out, nr, g

    old = PF.FLAT_ROWS_SORTED
    try:
        PF.FLAT_ROWS_SORTED = False
        ref = [run(True), run(False)]
        PF.FLAT_ROWS_SORTED = True
        got = [run(True), run(False)]
    finally:
        PF.FLAT_ROWS_SORTED = old
    for (o_a, nr_a, g_a), (o_b, nr_b, g_b) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
        for a, b in zip(nr_a, nr_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_a),
            jax.tree_util.tree_leaves(g_b),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pfn_flat_gradients_match_classic():
    from papc_tpu.detect.pfn_fast import (
        flatten_pillars,
        pfn_forward_flat,
    )

    P = 16
    pfn, variables, voxels, num_points, coords = _fixture(P=P, seed=4)
    args = _fast_args(variables, voxels, num_points, coords)
    points, owner = flatten_pillars(voxels, num_points, coords)
    cot = np.random.RandomState(5).randn(2, 256, 64).astype(np.float32)

    def classic_loss(params):
        out, _ = pfn.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(voxels),
            jnp.asarray(num_points),
            jnp.asarray(coords),
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * cot)

    def flat_loss(triple):
        kernel, scale, bias = triple
        out, _ = pfn_forward_flat(
            kernel, scale, bias, args["running"],
            jnp.asarray(points), jnp.asarray(owner),
            jnp.asarray(num_points), jnp.asarray(coords), P,
            voxel_size=VOXEL_SIZE, pc_range=PC_RANGE, train=True,
        )
        return jnp.sum(out * cot)

    g_c = jax.grad(classic_loss)(variables["params"])["PFNLayer_0"]
    g_f = jax.grad(flat_loss)(
        (args["kernel"], args["scale"], args["bias"])
    )
    for got, want in zip(
        g_f,
        (
            g_c["Dense_0"]["kernel"],
            g_c["BatchNorm_0"]["scale"],
            g_c["BatchNorm_0"]["bias"],
        ),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-4
        )


def test_pointpillars_flat_matches_classic():
    """PointPillars(pfn_flat=True) driven with flat points reproduces
    the classic padded-slot model head maps with the SAME param tree
    (voxels may be None in flat mode)."""
    from papc_tpu.detect.model import PointPillars
    from papc_tpu.detect.pfn_fast import flatten_pillars

    P = 8
    rng = np.random.RandomState(7)
    B, V, D = 2, 128, 4
    ny, nx = 16, 24
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        n = rng.randint(V // 2, V)
        lin = rng.choice(ny * nx, size=n, replace=False)
        coords[b, :n] = np.stack(
            [np.zeros(n), lin // nx, lin % nx], -1
        )
    num_points = rng.randint(0, P + 1, size=(B, V)).astype(np.int32)
    num_points[coords[..., 0] < 0] = 0
    voxels = rng.randn(B, V, P, D).astype(np.float32)
    slot = np.arange(P)[None, None, :]
    voxels *= (slot < num_points[..., None])[..., None]
    points, owner = flatten_pillars(voxels, num_points, coords)

    kw = dict(ny=ny, nx=nx, num_class=1, max_points_per_pillar=P)
    classic_m = PointPillars(pfn_flat=False, **kw)
    flat_m = PointPillars(pfn_flat=True, **kw)
    args_c = (
        jnp.asarray(voxels),
        jnp.asarray(num_points),
        jnp.asarray(coords),
    )
    variables = classic_m.init(KEY, *args_c, train=False)
    out_c, _ = classic_m.apply(
        variables, *args_c, train=True, mutable=["batch_stats"]
    )
    out_f, _ = flat_m.apply(
        variables,
        None,
        jnp.asarray(num_points),
        jnp.asarray(coords),
        train=True,
        points=jnp.asarray(points),
        point_pillar=jnp.asarray(owner),
        mutable=["batch_stats"],
    )
    for k in out_c:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_c[k]),
            rtol=1e-3, atol=1e-4, err_msg=k,
        )
