"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (per BASELINE.md): ShapeNet classification training
throughput in points/sec/chip on the flagship PointNet++ SSG model at the
reference's default scale (batch 32, 1024 points, 16 classes — reference
root ``train.py:5-16``). ``extra`` carries the other BASELINE.md metrics:
PointNet++ SSG epoch time (synthetic ShapeNet-sized epoch) and pillarize
ms/frame (full-KITTI-scale cloud through the native voxelizer).

Baseline: the reference publishes no numbers and cannot run here
(Paddle+CUDA). BASELINE.md documents a ~65k points/sec lower-bound
estimate for the CUDA-Paddle reference: its FPS alone serializes
npoint host↔device round-trips per SA layer (640 per forward at these
sizes — ``pointnet2_basic_layers.py:65-95``), bounding a train step near
~0.5 s. ``vs_baseline`` is measured-points-per-sec / 65536.
"""

import json
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 65536.0  # documented estimate, see docstring
B, N = 32, 1024
SHAPENET_TRAIN_SAMPLES = 12137  # 6 train shards of the ShapeNet h5 set


def _median_time(fn, block, steps=20, repeats=3):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn()
        block(out)
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def bench_train_step():
    import jax
    import jax.numpy as jnp

    from papc_tpu.models import init_model
    from papc_tpu.train.trainer import create_train_state, make_train_step

    spec = init_model("pointnet2_ssg", "clas", num_classes=16)
    rs = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rs.randn(B, N, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 16, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(spec, rng, batch)
    train_step, _ = make_train_step(spec)

    holder = {"state": state}

    def step():
        s, loss, _ = train_step(holder["state"], batch, rng)
        holder["state"] = s
        return loss

    # warmup / compile
    step().block_until_ready()
    dt = _median_time(step, lambda x: x.block_until_ready())
    return dt


def bench_pillarize():
    """Full-KITTI-scale cloud → pillars, host native voxelizer
    (reference numba claim: ~4.2 ms, ``point_cloud_ops.py:113-115``)."""
    rs = np.random.RandomState(0)
    pts = np.stack(
        [
            rs.uniform(0, 69.12, 120000),
            rs.uniform(-39.68, 39.68, 120000),
            rs.uniform(-3, 1, 120000),
            rs.rand(120000),
        ],
        axis=1,
    ).astype(np.float32)
    from papc_tpu.detect.voxelize_np import points_to_voxel

    args = ([0.16, 0.16, 4.0], [0, -39.68, -3, 69.12, 39.68, 1], 100, 12000)
    points_to_voxel(pts, *args)  # warmup
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        points_to_voxel(pts, *args)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    step_time = bench_train_step()
    pts_per_sec = B * N / step_time
    epoch_time = step_time * (SHAPENET_TRAIN_SAMPLES // B)
    pillarize_ms = bench_pillarize() * 1e3
    print(
        json.dumps(
            {
                "metric": "shapenet_clas_points_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(
                    pts_per_sec / BASELINE_POINTS_PER_SEC, 2
                ),
                "extra": {
                    "model": "pointnet2_ssg",
                    "batch": B,
                    "points": N,
                    "step_ms": round(step_time * 1e3, 3),
                    "pointnet2_ssg_epoch_sec": round(epoch_time, 2),
                    "pillarize_ms_per_frame": round(pillarize_ms, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
