"""COMPOSED-step A/B: BN output dtype follows compute dtype vs flax
default (f32 promotion) — bf16 PointPillars train step.

flax ``BatchNorm(dtype=None)`` promotes its output to f32 (running
stats are f32), so under bf16 compute every classic BN re-inflates the
activation stream — and every conv fed by it — to f32 traffic
(cost_analysis r5 bf16: 2.8 GB of f32[124,·,·,128] in ConvBlock_1
alone). ``detect.model.BN_DTYPE_FOLLOWS_INPUT`` keeps the normalize
output in the compute dtype (stats stay f32 either way). f32 mode is
bit-identical by construction (dtype=x.dtype == f32 == promotion
result), so only bf16 is measured.

Run: timeout 4000 python experiments/ab_bn_dtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

LOG = open("experiments/ab_bn_dtype.log", "a", buffering=1)


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
    from papc_tpu.detect import model as model_mod
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
    ARMS = {"bn_f32": False, "bn_follow": True}

    # single-step bf16 loss sanity (bf16 rounding differs between the
    # arms; finite + close is the bar, exactness lives in the CPU f32
    # goldens where the flag is a no-op)
    vals = {}
    for arm, flag in ARMS.items():
        model_mod.BN_DTYPE_FOLLOWS_INPUT = flag
        step, init_rm = make_detection_train_step(
            model, loss_cfg, precision="bf16"
        )
        s1, mets, _ = step(
            jax.tree_util.tree_map(jnp.copy, state), batch, init_rm()
        )
        vals[arm] = float(np.asarray(mets["loss"]))
        log(f"loss[{arm}] = {vals[arm]:.6f}")
    rel = abs(vals["bn_follow"] - vals["bn_f32"]) / (
        abs(vals["bn_f32"]) + 1e-9
    )
    log(f"loss rel diff (bf16 rounding): {rel:.3e}")
    assert np.isfinite(vals["bn_follow"]) and rel < 2e-2, vals

    compiled = {}
    for arm, flag in ARMS.items():
        model_mod.BN_DTYPE_FOLLOWS_INPUT = flag
        scan_step = make_scan_detection_train_step(
            model, loss_cfg, precision="bf16"
        )
        _, init_rm = make_detection_train_step(
            model, loss_cfg, precision="bf16"
        )
        for k in KS:
            log(f"compile {arm} K={k} ...")
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
            compiled[(arm, k)] = (scan_step, stacked, init_rm)
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
        t4 = best[(arm, KS[0])]
        t16 = best[(arm, KS[1])]
        slope = (t16 - t4) / (KS[1] - KS[0])
        bound = t16 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[f"{arm}_bf16"] = {
            "step_ms": round(step_ms, 3),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {arm} bf16: {step_ms:.3f} ms/step")
    print(json.dumps(out), flush=True)
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
