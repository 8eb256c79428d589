"""COMPOSED-step A/B: batch-folded 64-ch RPN block vs classic.

The RPN's 64-channel block lane-pads F=64→128 on every activation —
half of each (8, 128) tile is padding, fwd and bwd (VERDICT r4 #4:
~9.8 GB attributed). `_ConvBlock(batch_fold=True)` runs the
post-opening chain on the batch-folded [1, H, W, B*F] map with
block-diagonal kernels (exact; CPU goldens in test_s2d.py). NOTE this
is NOT the grouped-conv loser from profile_conv64 (`cg`,
feature_group_count) — it's a plain dense conv at 128 ch whose kernel
happens to be half zeros, and it halves the tile count, which
zero-padding (`cpp`) could not.

Measures the full scanned detection train step fold on/off, fp32 and
bf16, interleaved best-of in ONE process; asserts loss parity first.

Run: timeout 4000 python experiments/ab_fold64.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_fold64.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from papc_tpu.detect.train import (
        make_detection_train_step,
        make_scan_detection_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, loss_cfg, batch = fx["model"], fx["loss_cfg"], fx["batch"]
    state = fx["state"]
    KS = (4, 16)

    ARMS = {
        "classic": model,
        "fold": dataclasses.replace(model, rpn_batch_fold=True),
    }

    # single-step loss parity on chip (same state, same batch)
    vals = {}
    for arm, m in ARMS.items():
        step, init_rm = make_detection_train_step(m, loss_cfg)
        s1, mets, _ = step(
            jax.tree_util.tree_map(jnp.copy, state), batch, init_rm()
        )
        vals[arm] = float(np.asarray(mets["loss"]))
        log(f"loss[{arm}] = {vals[arm]:.6f}")
    rel = abs(vals["fold"] - vals["classic"]) / (
        abs(vals["classic"]) + 1e-9
    )
    log(f"loss parity rel diff: {rel:.3e}")
    assert rel < 1e-3, vals

    compiled = {}
    for arm, m in ARMS.items():
        for prec in ("fp32", "bf16"):
            scan_step = make_scan_detection_train_step(
                m, loss_cfg, precision=prec
            )
            _, init_rm = make_detection_train_step(
                m, loss_cfg, precision=prec
            )
            for k in KS:
                log(f"compile {arm} {prec} K={k} ...")
                t0 = time.perf_counter()
                stacked = jax.tree_util.tree_map(
                    lambda x, _k=k: jnp.broadcast_to(
                        x[None], (_k,) + x.shape
                    ),
                    batch,
                )
                s0 = jax.tree_util.tree_map(jnp.copy, state)
                s1, mk, _ = scan_step(s0, stacked, init_rm())
                np.asarray(mk["loss"][0])
                compiled[(arm, prec, k)] = (
                    scan_step, stacked, init_rm
                )
                log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(key):
        scan_step, stacked, init_rm = compiled[key]
        holder = {
            "s": jax.tree_util.tree_map(jnp.copy, state),
            "rm": init_rm(),
        }

        def call():
            holder["s"], mk, holder["rm"] = scan_step(
                holder["s"], stacked, holder["rm"]
            )
            return mk["loss"]

        return fetch_forced_time(
            call, k_small=2, k_large=5, repeats=3
        ).step_s

    best = {key: float("inf") for key in compiled}
    for r in range(4):
        for key in compiled:
            w = window(key)
            best[key] = min(best[key], w)
            log(f"round {r} {key}: {w * 1e3:.2f} ms/call")

    out = {}
    for arm in ARMS:
        for prec in ("fp32", "bf16"):
            t4 = best[(arm, prec, KS[0])]
            t16 = best[(arm, prec, KS[1])]
            slope = (t16 - t4) / (KS[1] - KS[0])
            bound = t16 / KS[1]
            step_ms = (slope if slope > 0 else bound) * 1e3
            out[f"{arm}_{prec}"] = {
                "step_ms": round(step_ms, 3),
                "method": "k-slope" if slope > 0 else "window-bound",
            }
            log(f"RESULT {arm} {prec}: {step_ms:.3f} ms/step")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
