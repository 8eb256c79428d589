"""Space-to-depth BEV path (ops/s2d.py + scatter_to_bev_s2d + the RPN
s2d branch): exact parity with the classic stride-2 pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from papc_tpu.ops.s2d import expand_stride2_kernel, space_to_depth_bev
from papc_tpu.ops.voxelize import (
    scatter_to_bev_batched,
    scatter_to_bev_s2d,
)

KEY = jax.random.PRNGKey(0)


def _coords(rng, B, V, ny, nx):
    """Unique in-range (z, y, x) cells per sample, some rows invalid."""
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        n = rng.randint(V // 2, V)
        lin = rng.choice(ny * nx, size=n, replace=False)
        coords[b, :n, 0] = 0
        coords[b, :n, 1] = lin // nx
        coords[b, :n, 2] = lin % nx
    return coords


def test_scatter_s2d_matches_transform_of_classic():
    rng = np.random.RandomState(0)
    B, V, C, ny, nx = 2, 64, 8, 12, 10
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    coords = jnp.asarray(_coords(rng, B, V, ny, nx))
    classic = scatter_to_bev_batched(feats, coords, ny, nx)
    direct = scatter_to_bev_s2d(feats, coords, ny, nx)
    via_transform = space_to_depth_bev(classic)
    assert direct.shape == (B, ny // 2 + 1, nx // 2 + 1, 4 * C)
    np.testing.assert_array_equal(
        np.asarray(direct), np.asarray(via_transform)
    )


def test_scatter_s2d_modes_exact():
    """Every S2D_SCATTER_MODE lowering (set / uniq / invg) is exact —
    same canvas AND same feature gradients — incl. duplicate dump rows
    (all-0.0 writes) and a fully-valid sample."""
    import importlib

    VX = importlib.import_module("papc_tpu.ops.voxelize")

    rng = np.random.RandomState(3)
    B, V, C, ny, nx = 2, 64, 8, 12, 10
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    coords = _coords(rng, B, V, ny, nx)
    coords[1] = _coords(np.random.RandomState(4), 1, V, ny, nx)[0]
    # make sample 0 fully valid (no dump rows at all)
    lin = np.random.RandomState(5).choice(ny * nx, V, replace=False)
    coords[0, :, 0] = 0
    coords[0, :, 1] = lin // nx
    coords[0, :, 2] = lin % nx
    coords = jnp.asarray(coords)

    def run():
        out = scatter_to_bev_s2d(feats, coords, ny, nx)
        g = jax.grad(
            lambda f: jnp.sum(
                jnp.sin(scatter_to_bev_s2d(f, coords, ny, nx))
            )
        )(feats)
        return np.asarray(out), np.asarray(g)

    old = VX.S2D_SCATTER_MODE
    try:
        VX.S2D_SCATTER_MODE = "set"
        ref_out, ref_g = run()
        for mode in ("uniq", "invg"):
            VX.S2D_SCATTER_MODE = mode
            out, g = run()
            np.testing.assert_array_equal(out, ref_out, err_msg=mode)
            np.testing.assert_array_equal(g, ref_g, err_msg=mode)
    finally:
        VX.S2D_SCATTER_MODE = old


def test_expanded_kernel_matches_stride2_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 8, 6) * 0.1).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    new = jax.lax.conv_general_dilated(
        space_to_depth_bev(x), expand_stride2_kernel(k), (1, 1), "VALID",
        dimension_numbers=dn,
    )
    np.testing.assert_allclose(
        np.asarray(new), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pointpillars_s2d_matches_classic():
    """Full PointPillars forward + grads: scatter_s2d=True reproduces the
    classic path with the SAME param tree (the s2d branch keeps the
    reference-shaped [3,3,C,O] kernel)."""
    from papc_tpu.detect.model import PointPillars

    rng = np.random.RandomState(2)
    B, V, P, D = 2, 128, 8, 4
    ny, nx = 16, 24  # divisible by 8 (3 stride-2 levels x up-strides)
    voxels = rng.randn(B, V, P, D).astype(np.float32)
    num_points = rng.randint(1, P + 1, size=(B, V)).astype(np.int32)
    slot = np.arange(P)[None, None, :]
    voxels *= (slot < num_points[..., None])[..., None]
    coords = _coords(rng, B, V, ny, nx)
    args = (
        jnp.asarray(voxels),
        jnp.asarray(num_points),
        jnp.asarray(coords),
    )

    kw = dict(ny=ny, nx=nx, num_class=1)
    classic_m = PointPillars(scatter_s2d=False, **kw)
    s2d_m = PointPillars(scatter_s2d=True, **kw)
    variables = classic_m.init(KEY, *args, train=False)
    # identical param/stats trees
    v2 = s2d_m.init(KEY, *args, train=False)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert a.shape == b.shape, jax.tree_util.keystr(pa)

    out_c, _ = classic_m.apply(
        variables, *args, train=True, mutable=["batch_stats"]
    )
    out_s, _ = s2d_m.apply(
        variables, *args, train=True, mutable=["batch_stats"]
    )
    for k in out_c:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_c[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )

    def loss(model, params):
        out, _ = model.apply(
            {
                "params": params,
                "batch_stats": variables["batch_stats"],
            },
            *args,
            train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(jnp.square(v)) for v in out.values())

    g_c = jax.grad(lambda p: loss(classic_m, p))(variables["params"])
    g_s = jax.grad(lambda p: loss(s2d_m, p))(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_c),
        jax.tree_util.tree_leaves_with_path(g_s),
    ):
        # fp32 reassociation through 11 conv layers + BN normalization
        # accumulates to ~1e-2 relative on the deepest kernels (outputs
        # above match at 1e-4; measured worst 8e-3)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(a) + 1e-2 * np.max(np.abs(a)) + 1e-12
        assert float(np.max(np.abs(a - b) / denom)) < 2e-2, (
            jax.tree_util.keystr(pa)
        )


def test_rpn_deferred_upsample_matches_classic():
    """RPN(deferred_upsample=True): coarse-res 1x1 deconv twins +
    phase-pooled BN + per-resolution heads + depth-to-space reproduce
    the classic ConvTranspose/concat path exactly (same param tree)."""
    from papc_tpu.detect.model import RPN

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    classic_m = RPN(num_class=1, deferred_upsample=False)
    fast_m = RPN(num_class=1, deferred_upsample=True)
    variables = classic_m.init(KEY, x, train=False)
    v2 = fast_m.init(KEY, x, train=False)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert a.shape == b.shape, jax.tree_util.keystr(pa)
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ), jax.tree_util.keystr(pa)

    for train in (True, False):
        out_c, mut_c = classic_m.apply(
            variables, x, train=train, mutable=["batch_stats"]
        )
        out_f, mut_f = fast_m.apply(
            variables, x, train=train, mutable=["batch_stats"]
        )
        for k in out_c:
            np.testing.assert_allclose(
                np.asarray(out_f[k]), np.asarray(out_c[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{k} train={train}",
            )
        if train:
            for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(
                    mut_c["batch_stats"]
                ),
                jax.tree_util.tree_leaves_with_path(
                    mut_f["batch_stats"]
                ),
            ):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-4,
                    atol=1e-5, err_msg=jax.tree_util.keystr(pa),
                )

    def loss(model, params):
        out, _ = model.apply(
            {
                "params": params,
                "batch_stats": variables["batch_stats"],
            },
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(jnp.square(v)) for v in out.values())

    g_c = jax.grad(lambda p: loss(classic_m, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(fast_m, p))(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_c),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(a) + 1e-2 * np.max(np.abs(a)) + 1e-12
        assert float(np.max(np.abs(a - b) / denom)) < 2e-2, (
            jax.tree_util.keystr(pa)
        )


def test_rpn_deferred_flat_minor_matches_6d():
    """The flattened-minor deferred layout ([b, h, w, s²·F] matmuls +
    tiled BN params + block-diagonal heads) reproduces the 6-D
    [b, h, w, p, q, F] deferred path — outputs, running stats, and
    param grads — on the same param tree."""
    import papc_tpu.detect.model as M

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    m = M.RPN(num_class=1, deferred_upsample=True)
    old = M.DEFERRED_FLAT_MINOR
    try:
        M.DEFERRED_FLAT_MINOR = False
        variables = m.init(KEY, x, train=False)

        def run(train):
            out, mut = m.apply(
                variables, x, train=train, mutable=["batch_stats"]
            )
            g = jax.grad(
                lambda p: sum(
                    jnp.sum(jnp.square(v))
                    for v in m.apply(
                        {
                            "params": p,
                            "batch_stats": variables["batch_stats"],
                        },
                        x,
                        train=True,
                        mutable=["batch_stats"],
                    )[0].values()
                )
            )(variables["params"])
            return out, mut["batch_stats"], g

        ref = run(True), run(False)
        M.DEFERRED_FLAT_MINOR = True
        got = run(True), run(False)
    finally:
        M.DEFERRED_FLAT_MINOR = old

    for (out_a, bs_a, g_a), (out_b, bs_b, g_b) in zip(ref, got):
        for k in out_a:
            np.testing.assert_allclose(
                np.asarray(out_b[k]), np.asarray(out_a[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {"bs": bs_a, "g": g_a}
            ),
            jax.tree_util.tree_leaves_with_path(
                {"bs": bs_b, "g": g_b}
            ),
        ):
            # reduction order differs (one fused dot vs per-phase
            # dots) — compare with a max-scaled relative denominator
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            denom = np.abs(a) + 1e-2 * np.max(np.abs(a)) + 1e-12
            assert float(np.max(np.abs(a - b) / denom)) < 2e-3, (
                jax.tree_util.keystr(pa)
            )


def test_rpn_batch_fold_matches_classic():
    """RPN(batch_fold=True): the narrow (64-ch) conv block's
    batch-folded [1, H, W, B*F] chain (block-diagonal kernels +
    fold-pooled BN stats) reproduces the classic per-sample path
    exactly — outputs, running stats, and param grads — on the SAME
    param tree."""
    from papc_tpu.detect.model import RPN

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    classic_m = RPN(num_class=1, num_filters=(64, 128, 256),
                    batch_fold=False)
    fold_m = RPN(num_class=1, num_filters=(64, 128, 256),
                 batch_fold=True)
    variables = classic_m.init(KEY, x, train=False)
    v2 = fold_m.init(KEY, x, train=False)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert a.shape == b.shape, jax.tree_util.keystr(pa)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for train in (True, False):
        out_c, mut_c = classic_m.apply(
            variables, x, train=train, mutable=["batch_stats"]
        )
        out_f, mut_f = fold_m.apply(
            variables, x, train=train, mutable=["batch_stats"]
        )
        for k in out_c:
            np.testing.assert_allclose(
                np.asarray(out_f[k]), np.asarray(out_c[k]),
                rtol=2e-4, atol=5e-5, err_msg=f"{k} train={train}",
            )
        if train:
            for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(
                    mut_c["batch_stats"]
                ),
                jax.tree_util.tree_leaves_with_path(
                    mut_f["batch_stats"]
                ),
            ):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=2e-4,
                    atol=5e-5, err_msg=jax.tree_util.keystr(pa),
                )

    def loss(model, params):
        out, _ = model.apply(
            {
                "params": params,
                "batch_stats": variables["batch_stats"],
            },
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(jnp.square(v)) for v in out.values())

    g_c = jax.grad(lambda p: loss(classic_m, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(fold_m, p))(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_c),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(a) + 1e-2 * np.max(np.abs(a)) + 1e-12
        assert float(np.max(np.abs(a - b) / denom)) < 2e-2, (
            jax.tree_util.keystr(pa)
        )


def test_rpn_batch_fold_single_sample_noop():
    """B=1 batches bypass the fold (nothing to fold) and still work."""
    from papc_tpu.detect.model import RPN

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 16, 24, 32).astype(np.float32))
    m = RPN(num_class=1, batch_fold=True)
    variables = m.init(KEY, x, train=False)
    out, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out["box_preds"].shape[0] == 1
