"""COMPOSED-step A/B for the scatter-add tile default (VERDICT r4 #1).

The r4 flip t=512 -> 2048 was justified only by the ISOLATED kernel
sweep (ab_scatter_tile.log); BENCH_r04 then recorded the scanned SSG
step at 16.08 ms vs r3's 14.28 — prime suspect is exactly this flip
inverting under composition (scoped-VMEM demotions inside the scanned
program). This measures the real thing: the full scanned SSG train
step (make_scan_train_step, K=8 vs 32 scan-slope), one arm per tile
default via scatter.override_tile, all arms compiled up front, then
interleaved best-of rounds in ONE process.

Run: timeout 4000 python experiments/ab_scatter_composed.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_scatter_composed.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from papc_tpu.models import init_model
    from papc_tpu.ops.pallas import scatter
    from papc_tpu.train.trainer import (
        create_train_state,
        make_scan_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    B, N = 32, 1024
    KS = (8, 32)
    ARMS = [512, 1024, 2048]

    spec = init_model("pointnet2_ssg", "clas", num_classes=16)
    rs = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rs.randn(B, N, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 16, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(spec, rng, batch)

    # build + compile every (arm, K) up front, under the arm's override
    # (override is trace-time; each make_scan_train_step returns a fresh
    # jit, so arms never share a compiled program)
    compiled = {}
    for t_tile in ARMS:
        for k in KS:
            log(f"compile t={t_tile} K={k} ...")
            t0 = time.perf_counter()
            with scatter.override_tile(t=t_tile):
                scan_step = make_scan_train_step(spec, k)
                stacked = jax.tree_util.tree_map(
                    lambda x, _k=k: jnp.broadcast_to(
                        x[None], (_k,) + x.shape
                    ),
                    batch,
                )
                s0 = jax.tree_util.tree_map(jnp.copy, state)
                s1, losses, _ = scan_step(s0, stacked, rng)
                np.asarray(losses[0])
            compiled[(t_tile, k)] = (scan_step, stacked)
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(t_tile, k):
        scan_step, stacked = compiled[(t_tile, k)]
        holder = {"s": jax.tree_util.tree_map(jnp.copy, state)}

        def call():
            holder["s"], losses, _ = scan_step(
                holder["s"], stacked, rng
            )
            return losses

        return fetch_forced_time(
            call, k_small=2, k_large=5, repeats=3
        ).step_s

    best = {key: float("inf") for key in compiled}
    for r in range(4):
        for t_tile in ARMS:
            for k in KS:
                w = window(t_tile, k)
                best[(t_tile, k)] = min(best[(t_tile, k)], w)
                log(f"round {r} t={t_tile} K={k}: {w * 1e3:.2f} ms/call")

    out = {}
    for t_tile in ARMS:
        t8, t32 = best[(t_tile, KS[0])], best[(t_tile, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[f"t{t_tile}"] = {
            "step_ms": round(step_ms, 3),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT t={t_tile}: {step_ms:.3f} ms/step")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
