"""Staged r3 A/B (b): PointPillars scanned train step, fused PFN +
batch-folded scatter (the current default) vs classic op-by-op PFN,
at one precision per invocation (fp32 | bf16), interleaved in ONE
process.

The compiled-HLO HBM profile said the padded PFN activations were ~20
of 33 GB/step, so the fused route should be a large win — this measures
it. Progress logs to experiments/ab_pointpillars_pfn.log.

Run: timeout 1800 python experiments/ab_pointpillars_pfn.py fp32
     timeout 1800 python experiments/ab_pointpillars_pfn.py bf16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open("experiments/ab_pointpillars_pfn.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from papc_tpu.detect.train import make_scan_detection_train_step
    from papc_tpu.ops import fused_mlp
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()} precision={precision}")
    fx = bench._pointpillars_fixture()
    model, loss_cfg, batch = fx["model"], fx["loss_cfg"], fx["batch"]

    ARMS = {"fused": dict(enable=True), "classic": dict(enable=False)}
    KS = (2, 8)
    progs = {}
    for arm, ov in ARMS.items():
        for k in KS:
            log(f"compile arm={arm} K={k} {precision} ...")
            t0 = time.perf_counter()
            with fused_mlp.override(**ov):
                scan_step = make_scan_detection_train_step(
                    model, loss_cfg, precision=precision
                )
                stacked = jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(
                        x[None], (k,) + x.shape), batch
                )
                from papc_tpu.detect.train import (
                    make_detection_train_step,
                )
                _, init_rm = make_detection_train_step(
                    model, loss_cfg, precision=precision
                )
                h = {"s": jax.tree_util.tree_map(jnp.copy, fx["state"]),
                     "rm": init_rm()}
                h["s"], mk, h["rm"] = scan_step(h["s"], stacked, h["rm"])
                loss = float(mk["loss"][-1] if mk["loss"].ndim else
                             mk["loss"])
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s "
                f"loss={loss:.4f}")
            progs[(arm, k)] = (scan_step, stacked, init_rm)

    def window(arm, k):
        scan_step, stacked, init_rm = progs[(arm, k)]
        h = {"s": jax.tree_util.tree_map(jnp.copy, fx["state"]),
             "rm": init_rm()}

        def call():
            h["s"], mk, h["rm"] = scan_step(h["s"], stacked, h["rm"])
            return mk["loss"]

        res = fetch_forced_time(call, k_small=2, k_large=4, repeats=3)
        return res.step_s

    best = {key: float("inf") for key in progs}
    for r in range(4):
        for arm in ARMS:
            for k in KS:
                t = window(arm, k)
                best[(arm, k)] = min(best[(arm, k)], t)
                log(f"round {r} arm={arm} K={k}: {t*1e3:.2f} ms")

    out = {"precision": precision}
    for arm in ARMS:
        t2, t8 = best[(arm, KS[0])], best[(arm, KS[1])]
        slope = (t8 - t2) / (KS[1] - KS[0])
        bound = t8 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[arm] = {
            "step_ms": step_ms,
            "method": "k-slope" if slope > 0 else "window-bound",
            "t2_ms": t2 * 1e3, "t8_ms": t8 * 1e3,
        }
        log(f"RESULT {precision} arm={arm}: step={step_ms:.2f} ms "
            f"({out[arm]['method']})")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
