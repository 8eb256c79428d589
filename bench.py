"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (per BASELINE.md): ShapeNet classification training
throughput in points/sec/chip on the flagship PointNet++ SSG model at the
reference's default scale (batch 32, 1024 points, 16 classes — reference
root ``train.py:5-16``).

Baseline: the reference publishes no numbers and cannot run here
(Paddle+CUDA). BASELINE.md's documented lower-bound estimate for the
CUDA-Paddle reference is ~65k points/sec: its FPS alone serializes
npoint host↔device round-trips per SA layer (640 per forward at these
sizes — ``pointnet2_basic_layers.py:65-95``), bounding a train step near
~0.5 s. ``vs_baseline`` is measured-points-per-sec / 65536.
"""

import json
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 65536.0  # documented estimate, see module docstring
B, N = 32, 1024


def main():
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

    # warmup / compile
    state, loss, _ = train_step(state, batch, rng)
    loss.block_until_ready()

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = train_step(state, batch, rng)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / steps

    pts_per_sec = B * N / dt
    print(
        json.dumps(
            {
                "metric": "shapenet_clas_points_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 2),
                "extra": {
                    "model": "pointnet2_ssg",
                    "batch": B,
                    "points": N,
                    "step_ms": round(dt * 1e3, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
