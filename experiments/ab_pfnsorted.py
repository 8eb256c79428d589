"""Composed-step A/B: FLAT_ROWS_SORTED True vs False.

pfn_forward_flat's segment scatter-add/max in the per-sample-dump
sorted row space with indices_are_sorted=True (the C++ streamer and
flatten_pillars both emit pillar-grouped order; bit-exact parity in
tests/test_pfn_fast.py::test_pfn_flat_sorted_rows_exact). Per
CLAUDE.md the default flip must be justified by the COMPOSED scanned
train step, one process, interleaved best-of.

Run: timeout 4000 python experiments/ab_pfnsorted.py [bf16|fp32 ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_pfnsorted.log", "a", buffering=1)


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
    import papc_tpu.detect.pfn_fast as M
    from papc_tpu.detect.train import (
        make_detection_train_step,
        make_scan_detection_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    precs = sys.argv[1:] or ["bf16", "fp32"]
    log(f"devices: {jax.devices()} precs={precs}")
    fx = bench._pointpillars_fixture()
    model, loss_cfg, batch = fx["model"], fx["loss_cfg"], fx["batch"]
    state = fx["state"]
    KS = (4, 16)

    compiled = {}
    for prec in precs:
        for flat in (True, False):
            M.FLAT_ROWS_SORTED = flat
            scan_step = make_scan_detection_train_step(
                model, loss_cfg, precision=prec
            )
            _, init_rm = make_detection_train_step(
                model, loss_cfg, precision=prec
            )
            name = f"{'sorted' if flat else 'plain'}_{prec}"
            for k in KS:
                log(f"compile {name} K={k} ...")
                t0 = time.perf_counter()
                stacked = jax.tree_util.tree_map(
                    lambda x, _k=k: jnp.broadcast_to(
                        x[None], (_k,) + x.shape
                    ),
                    batch,
                )
                s0 = jax.tree_util.tree_map(jnp.copy, state)
                s1, mk, _ = scan_step(s0, stacked, init_rm())
                loss0 = float(np.asarray(mk["loss"][0]))
                compiled[(name, k)] = (scan_step, stacked, init_rm)
                log(
                    f"  compiled+ran in {time.perf_counter() - t0:.1f}s"
                    f" loss[0]={loss0:.6f}"
                )

    def window(name, k):
        scan_step, stacked, init_rm = compiled[(name, k)]
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

    names = sorted({n for n, _ in compiled})
    best = {key: float("inf") for key in compiled}
    for r in range(3):
        for name in names:
            for k in KS:
                t = window(name, k)
                best[(name, k)] = min(best[(name, k)], t)
                log(f"round {r} {name} K={k}: {t * 1e3:.2f} ms")

    out = {}
    for name in names:
        t4, t16 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t16 - t4) / (KS[1] - KS[0])
        bound = t16 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[name] = {
            "step_ms": round(step_ms, 3),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_ms:.3f} ms/step")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
