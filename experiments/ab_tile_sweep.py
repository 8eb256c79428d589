"""Staged r3 A/B (c): PAPC_SAMLP_TILE_TARGET sweep on the SSG scanned
train step (stream mode, the default fused path).

pass_tile reads the env var at TRACE time, so each setting gets its own
freshly-built scan program. Interleaved windows in ONE process.

Run: timeout 1800 python experiments/ab_tile_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open("experiments/ab_tile_sweep.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np
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

    TARGETS = [0, 2048, 8192]  # 0 = pass_tile's built-in default (4096)
    KS = (8, 32)
    progs = {}
    failed = set()
    for tgt in TARGETS:
        for k in KS:
            if tgt in failed:
                continue
            log(f"compile tile_target={tgt} K={k} ...")
            t0 = time.perf_counter()
            # env var is read at TRACE time; restore it immediately so
            # a remote-compile 500 can't leak the setting into later
            # programs in this process
            os.environ["PAPC_SAMLP_TILE_TARGET"] = str(tgt)
            try:
                with fused_mlp.override(enable=True, mode="stream"):
                    scan_step = make_scan_train_step(spec, k)
                    stacked = jax.tree_util.tree_map(
                        lambda x: jnp.broadcast_to(
                            x[None], (k,) + x.shape), batch
                    )
                    h = {"s": jax.tree_util.tree_map(jnp.copy, state)}
                    h["s"], losses, _ = scan_step(h["s"], stacked, rng)
                    float(losses[-1])
            except Exception as e:
                # e.g. scoped-VMEM OOM under the scanned program at fat
                # tiles — drop the target, keep sweeping
                failed.add(tgt)
                log(f"  FAILED ({type(e).__name__}): "
                    f"{str(e).splitlines()[-1][:200]}")
                continue
            finally:
                os.environ.pop("PAPC_SAMLP_TILE_TARGET", None)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")
            progs[(tgt, k)] = (scan_step, stacked)
    TARGETS = [t for t in TARGETS if t not in failed]

    def window(tgt, k):
        scan_step, stacked = progs[(tgt, k)]
        h = {"s": jax.tree_util.tree_map(jnp.copy, state)}

        def call():
            h["s"], losses, _ = scan_step(h["s"], stacked, rng)
            return losses

        res = fetch_forced_time(call, k_small=2, k_large=5, repeats=3)
        return res.step_s

    best = {key: float("inf") for key in progs}
    for r in range(3):
        for tgt in TARGETS:
            for k in KS:
                t = window(tgt, k)
                best[(tgt, k)] = min(best[(tgt, k)], t)
                log(f"round {r} tgt={tgt} K={k}: {t*1e3:.2f} ms")

    out = {}
    for tgt in TARGETS:
        t8, t32 = best[(tgt, KS[0])], best[(tgt, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[str(tgt)] = {
            "step_ms": step_ms,
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT tgt={tgt}: step={step_ms:.2f} ms")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
