"""Voxelizer tests: host numpy vs reference semantics, device jnp vs host."""

import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.detect.voxelize_np import (
    VoxelGenerator,
    compute_grid_size,
    points_to_bev,
    points_to_voxel,
)
from papc_tpu.ops.voxelize import scatter_to_bev, voxelize

VSIZE = [0.5, 0.5, 1.0]
RANGE = [0.0, 0.0, 0.0, 4.0, 4.0, 2.0]  # grid 8 x 8 x 2


def test_grid_size():
    np.testing.assert_array_equal(
        compute_grid_size(VSIZE, RANGE), [8, 8, 2]
    )
    np.testing.assert_array_equal(
        compute_grid_size(
            [0.16, 0.16, 4.0], [0, -39.68, -3, 69.12, 39.68, 1]
        ),
        [432, 496, 1],
    )


class TestHostVoxelize:
    def test_basic_grouping(self):
        pts = np.array(
            [
                [0.1, 0.1, 0.5, 1.0],  # cell (0,0,0)
                [0.2, 0.2, 0.5, 2.0],  # cell (0,0,0)
                [1.1, 0.1, 0.5, 3.0],  # cell (2,0,0)
                [9.0, 9.0, 9.0, 4.0],  # out of range
            ],
            np.float32,
        )
        voxels, coords, n = points_to_voxel(pts, VSIZE, RANGE, 5, 10)
        assert voxels.shape == (2, 5, 4)
        np.testing.assert_array_equal(n, [2, 1])
        # first-come voxel order; coords are (z, y, x)
        np.testing.assert_array_equal(coords[0], [0, 0, 0])
        np.testing.assert_array_equal(coords[1], [0, 0, 2])
        np.testing.assert_allclose(voxels[0, 0], pts[0])
        np.testing.assert_allclose(voxels[0, 1], pts[1])
        np.testing.assert_allclose(voxels[0, 2], 0.0)

    def test_max_points_first_come(self):
        pts = np.stack(
            [
                np.full(6, 0.1),
                np.full(6, 0.1),
                np.full(6, 0.5),
                np.arange(6, dtype=np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        voxels, coords, n = points_to_voxel(pts, VSIZE, RANGE, 3, 10)
        np.testing.assert_array_equal(n, [3])
        np.testing.assert_allclose(voxels[0, :, 3], [0, 1, 2])

    def test_max_voxels_drops_late_voxels(self):
        pts = np.array(
            [
                [0.1, 0.1, 0.5],  # voxel A
                [1.1, 0.1, 0.5],  # voxel B
                [2.1, 0.1, 0.5],  # voxel C (dropped)
                [0.2, 0.2, 0.5],  # voxel A again — still collected
            ],
            np.float32,
        )
        voxels, coords, n = points_to_voxel(pts, VSIZE, RANGE, 5, 2)
        assert len(n) == 2
        np.testing.assert_array_equal(n, [2, 1])

    def test_generator_facade(self):
        gen = VoxelGenerator(VSIZE, RANGE, max_num_points=5, max_voxels=128)
        np.testing.assert_array_equal(gen.grid_size, [8, 8, 2])
        pts = np.random.RandomState(0).uniform(0, 4, (50, 4)).astype(
            np.float32
        )
        pts[:, 2] /= 2
        voxels, coords, n = gen.generate(pts)
        assert n.sum() == 50


class TestDeviceVoxelize:
    def test_matches_host(self, rng):
        pts = rng.uniform(0, 4, (64, 4)).astype(np.float32)
        pts[:, 2] /= 2
        # no-overflow regime: voxel SET matches the host exactly (under
        # max_voxels overflow the kept set legitimately differs — device
        # keeps lowest cell ids, host keeps first-occurrence)
        hv, hc, hn = points_to_voxel(pts, VSIZE, RANGE, 8, 64)
        out = voxelize(
            jnp.asarray(pts), None, VSIZE, RANGE, (8, 8, 2), 8, 64
        )
        K = int(out.num_voxels)
        assert K == len(hn)
        # compare as dict keyed by coord (device voxel order differs)
        host = {tuple(hc[i]): (hv[i], hn[i]) for i in range(len(hn))}
        for i in range(K):
            key = tuple(np.asarray(out.coords[i]))
            assert key in host
            v_host, n_host = host[key]
            assert int(out.num_points[i]) == n_host
            np.testing.assert_allclose(
                np.asarray(out.voxels[i]), v_host, atol=1e-6
            )

    def test_padding_mask_respected(self, rng):
        pts = rng.uniform(0, 4, (32, 4)).astype(np.float32)
        pts[:, 2] /= 2
        mask = np.ones(32, bool)
        mask[20:] = False
        out = voxelize(
            jnp.asarray(pts), jnp.asarray(mask), VSIZE, RANGE,
            (8, 8, 2), 8, 32,
        )
        assert int(out.num_points.sum()) == 20

    def test_jit_static(self, rng):
        import jax

        pts = jnp.asarray(rng.uniform(0, 4, (64, 4)), jnp.float32)
        f = jax.jit(
            lambda p: voxelize(p, None, VSIZE, RANGE, (8, 8, 2), 8, 32)
        )
        out = f(pts)
        assert out.voxels.shape == (32, 8, 4)


class TestScatter:
    def test_scatter_roundtrip(self):
        feats = jnp.asarray(
            [[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]], jnp.float32
        )
        coords = jnp.asarray(
            [[0, 1, 2], [0, 3, 0], [-1, -1, -1]], jnp.int32
        )
        canvas = scatter_to_bev(feats, coords, ny=4, nx=4)
        assert canvas.shape == (4, 4, 2)
        np.testing.assert_allclose(np.asarray(canvas[1, 2]), [1, 2])
        np.testing.assert_allclose(np.asarray(canvas[3, 0]), [3, 4])
        assert float(jnp.abs(canvas).sum()) == 10.0

    def test_batched_matches_vmap(self):
        """scatter_to_bev_batched (flat batch-folded rows) ≡
        vmap(scatter_to_bev) — values AND gradients."""
        import jax

        from papc_tpu.ops.voxelize import scatter_to_bev_batched

        rng = np.random.default_rng(0)
        B, V, C, ny, nx = 3, 17, 5, 6, 4
        feats = jnp.asarray(rng.normal(size=(B, V, C)), jnp.float32)
        coords = np.stack(
            [
                np.zeros((B, V), np.int64),
                rng.integers(0, ny, (B, V)),
                rng.integers(0, nx, (B, V)),
            ],
            axis=-1,
        )
        # de-duplicate cells per sample (coords are unique by
        # construction in the real pipeline) and invalidate a tail
        for b in range(B):
            lin = coords[b, :, 1] * nx + coords[b, :, 2]
            _, first = np.unique(lin, return_index=True)
            dup = np.setdiff1d(np.arange(V), first)
            coords[b, dup] = -1
        coords[:, -3:] = -1
        coords = jnp.asarray(coords, jnp.int32)

        def loss_a(f):
            out = scatter_to_bev_batched(f, coords, ny, nx)
            return jnp.sum(out * out), out

        def loss_b(f):
            out = jax.vmap(
                lambda fe, co: scatter_to_bev(fe, co, ny, nx)
            )(f, coords)
            return jnp.sum(out * out), out

        (la, oa), ga = jax.value_and_grad(loss_a, has_aux=True)(feats)
        (lb, ob), gb = jax.value_and_grad(loss_b, has_aux=True)(feats)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob))
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb))


def test_bev_map():
    pts = np.array(
        [[0.1, 0.1, 0.5, 0.9], [0.2, 0.2, 1.5, 0.1], [3.9, 3.9, 0.1, 0.5]],
        np.float32,
    )
    bev = points_to_bev(pts, VSIZE, RANGE, with_reflectivity=True)
    assert bev.shape == (4, 8, 8)  # 2 height slices + density + refl
    assert bev[0, 0, 0] == pytest.approx(0.5)
    assert bev[1, 0, 0] == pytest.approx(1.5)
    assert bev[2, 0, 0] > 0  # density


def test_cc_points_to_voxel_flat_matches_grid():
    """Flat-mode C++ voxelizer vs the grid voxelizer + flatten: same
    coords, same counts, same per-pillar point SETS (within-pillar
    order may differ — compare keyed-sorted rows)."""
    from papc_tpu import cc
    from papc_tpu.detect.pfn_fast import flatten_pillars
    from papc_tpu.detect.voxelize_np import points_to_voxel

    if not cc.available():
        pytest.skip("papc_cc not built")
    rng = np.random.RandomState(0)
    n = 20000
    pts = np.concatenate(
        [
            rng.uniform(0, 69, (n, 1)),
            rng.uniform(-39, 39, (n, 1)),
            rng.uniform(-3, 1, (n, 1)),
            rng.rand(n, 1),
        ],
        1,
    ).astype(np.float32)
    vs = np.array((0.16, 0.16, 4.0), np.float32)
    pr = np.array((0.0, -39.68, -3.0, 69.12, 39.68, 1.0), np.float32)
    vox, coords, nppv = points_to_voxel(
        pts, vs, pr, 100, 12000, pad_output=True
    )
    flat, owner, coords2, nppv2, k = cc.points_to_voxel_flat(
        pts, vs, pr, 100, 12000, 25600
    )
    np.testing.assert_array_equal(coords[:k], coords2[:k])
    np.testing.assert_array_equal(nppv, nppv2)
    ref_flat, ref_owner = flatten_pillars(
        vox[None], nppv[None], coords[None]
    )
    assert int((owner >= 0).sum()) == int((ref_owner >= 0).sum())

    # the streamer counting-sorts by pillar (stable): the valid prefix
    # is grouped by ascending owner, bit-identical to grid+flatten
    # (which emits voxel-major slot order by construction)
    m = owner >= 0
    rm = ref_owner[0] >= 0
    assert np.all(np.diff(owner[m]) >= 0), "owners not sorted"
    np.testing.assert_array_equal(owner[m], ref_owner[0][rm])
    np.testing.assert_array_equal(flat[m], ref_flat[0][rm])
