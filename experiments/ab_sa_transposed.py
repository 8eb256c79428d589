"""COMPOSED-step A/B: channel-sublane SA grouping vs the row path.

The isolated kernels won big (ab_gather_t: SA1 gather fwd+bwd 4.88 →
1.42 ms, SA2 3.52 → 2.22); per the no-isolated-evidence rule this
measures the full scanned SSG train step with the transposed grouping
(default) vs fused_mlp.override(transposed_group=False) (the r4 row
path), both fp32 and bf16, interleaved best-of in ONE process.

Also asserts value parity on chip first: one eval forward both ways.

Run: timeout 4000 python experiments/ab_sa_transposed.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_sa_transposed.log", "a", buffering=1)


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
    KS = (8, 32)

    spec = init_model("pointnet2_ssg", "clas", num_classes=16)
    rs = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rs.randn(B, N, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 16, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(spec, rng, batch)

    # on-chip value parity: eval logits, transposed vs row
    variables = {
        "params": state.params, "batch_stats": state.batch_stats
    }
    with fused_mlp.override(transposed_group=False):
        fn_row = jax.jit(
            lambda v, p: spec.model.apply(v, p, train=False)
        )
        out_row = np.asarray(fn_row(variables, batch["points"]))
    fn_t = jax.jit(lambda v, p: spec.model.apply(v, p, train=False))
    out_t = np.asarray(fn_t(variables, batch["points"]))
    err = np.abs(out_t - out_row).max()
    log(f"eval logits parity: max|diff|={err:.3e}")
    assert err < 5e-2, f"transposed path diverges: {err}"

    ARMS = {"row": dict(transposed_group=False), "t": {}}
    compiled = {}
    for arm, ov in ARMS.items():
        for prec in ("fp32", "bf16"):
            for k in KS:
                log(f"compile {arm} {prec} K={k} ...")
                t0 = time.perf_counter()
                with fused_mlp.override(**ov):
                    scan_step = make_scan_train_step(
                        spec, k, precision=prec
                    )
                    stacked = jax.tree_util.tree_map(
                        lambda x, _k=k: jnp.broadcast_to(
                            x[None], (_k,) + x.shape
                        ),
                        batch,
                    )
                    s0 = jax.tree_util.tree_map(jnp.copy, state)
                    s1, losses, _ = scan_step(s0, stacked, rng)
                    np.asarray(losses[0])
                compiled[(arm, prec, k)] = (scan_step, stacked)
                log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(key):
        scan_step, stacked = compiled[key]
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
        for key in compiled:
            w = window(key)
            best[key] = min(best[key], w)
            log(f"round {r} {key}: {w * 1e3:.2f} ms/call")

    out = {}
    for arm, _ in ARMS.items():
        for prec in ("fp32", "bf16"):
            t8 = best[(arm, prec, KS[0])]
            t32 = best[(arm, prec, KS[1])]
            slope = (t32 - t8) / (KS[1] - KS[0])
            bound = t32 / KS[1]
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
