"""Staged r3 A/B (a): fused SA-MLP mode stream vs recompute1 on the
full SSG scanned train step, interleaved in ONE process.

recompute1 = single-launch passes with in-kernel double-buffered DMA
(ops/pallas/samlp_single.py) — one grid step per pass instead of ~2000,
removing the ~6 us/grid-step Mosaic overhead that made recompute equal
stream.  Progress logs to experiments/ab_samlp_mode.log (risky Pallas
compiles go through the remote relay; a crash mid-compile must leave a
trail).

Run: timeout 1800 python experiments/ab_samlp_mode.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_samlp_mode.log", "a", buffering=1)


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
    from papc_tpu.ops import fused_mlp
    from papc_tpu.train.trainer import (
        create_train_state,
        make_scan_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    B, N = 32, 1024
    spec = init_model("pointnet2_ssg", "clas", num_classes=16)
    rs = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rs.randn(B, N, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 16, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(spec, rng, batch)

    MODES = ("stream", "recompute1")
    KS = (8, 32)
    # Build + compile every (mode, K) program up front, one at a time,
    # logging before each risky compile.
    progs = {}
    for mode in MODES:
        for k in KS:
            log(f"compile mode={mode} K={k} ...")
            t0 = time.perf_counter()
            with fused_mlp.override(enable=True, mode=mode):
                scan_step = make_scan_train_step(spec, k)
                stacked = jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(
                        x[None], (k,) + x.shape), batch
                )
                h = {"s": jax.tree_util.tree_map(jnp.copy, state)}
                h["s"], losses, _ = scan_step(h["s"], stacked, rng)
                float(losses[-1])  # force through compile+run
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s "
                f"loss={float(losses[-1]):.4f}")
            progs[(mode, k)] = (scan_step, stacked)

    def window(mode, k):
        scan_step, stacked = progs[(mode, k)]
        h = {"s": jax.tree_util.tree_map(jnp.copy, state)}

        def call():
            h["s"], losses, _ = scan_step(h["s"], stacked, rng)
            return losses

        res = fetch_forced_time(call, k_small=2, k_large=5, repeats=3)
        return res.step_s  # whole-call seconds

    # Interleaved rounds: mode-major inside each round so relay phase
    # shifts hit both arms.
    best = {key: float("inf") for key in progs}
    ROUNDS = 4
    for r in range(ROUNDS):
        for mode in MODES:
            for k in KS:
                t = window(mode, k)
                best[(mode, k)] = min(best[(mode, k)], t)
                log(f"round {r} mode={mode} K={k}: {t*1e3:.2f} ms")

    out = {}
    for mode in MODES:
        t8, t32 = best[(mode, KS[0])], best[(mode, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[mode] = {
            "step_ms": step_ms,
            "method": "k-slope" if slope > 0 else "window-bound",
            "t8_ms": t8 * 1e3, "t32_ms": t32 * 1e3,
        }
        log(f"RESULT mode={mode}: step={step_ms:.2f} ms "
            f"({out[mode]['method']}; t8={t8*1e3:.1f} t32={t32*1e3:.1f})")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
