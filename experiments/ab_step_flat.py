"""Composed PointPillars step: classic vs the new default fast path
(s2d scatter+conv + flat-points PFN + channel-sublane metrics).

Follows ab_step_s2d (same process rules). The batch uses realistic
pillar occupancy (1-2 pts/pillar, sum < 25600) so the flat view is
exactly the classic computation; classic timing is shape-bound and
unaffected by occupancy.

  1. parity: classic vs fast head maps, same params, on chip
  2. e2e: 3 real jitted fast-path train steps (loss finite, decreasing)
  3. scanned K-slope A/B: ppc_f32 vs ppfast_f32 vs ppfast_bf16

Run: timeout 3000 python experiments/ab_step_flat.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_step_flat.log", "a", buffering=1)


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
    from papc_tpu.detect.pfn_fast import flatten_pillars
    from papc_tpu.detect.train import (
        make_detection_train_step,
        make_scan_detection_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    # pin the baseline: the fixture model follows builders' defaults
    # (s2d+flat since r4), so "classic" must be forced explicitly
    model = fx["model"].clone(scatter_s2d=False, pfn_flat=False)
    state = fx["state"]
    loss_cfg = fx["loss_cfg"]
    KS = (4, 16)
    N_CAP = 25600

    # realistic occupancy; flat view == classic exactly
    rs = np.random.RandomState(0)
    batch = dict(fx["batch"])
    Bd, V, P, D = batch["voxels"].shape
    num_points = rs.randint(1, 3, size=(Bd, V)).astype(np.int32)
    voxels = np.asarray(batch["voxels"])
    slot = np.arange(P)[None, None, :]
    voxels = voxels * (slot < num_points[..., None])[..., None]
    batch["voxels"] = jnp.asarray(voxels)
    batch["num_points"] = jnp.asarray(num_points)
    points, owner = flatten_pillars(
        voxels, num_points, np.asarray(batch["coordinates"]), N_CAP
    )
    fast_batch = {
        k: v for k, v in batch.items() if k != "voxels"
    }
    fast_batch["points_flat"] = jnp.asarray(points)
    fast_batch["point_pillar"] = jnp.asarray(owner)

    model_fast = model.clone(scatter_s2d=True, pfn_flat=True,
                             max_points_per_pillar=P)
    model_def = model_fast.clone(rpn_deferred_upsample=True)

    # ---- 1. parity -----------------------------------------------------
    out_c = jax.jit(
        lambda: model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["voxels"], batch["num_points"], batch["coordinates"],
            train=False,
        )
    )()
    out_f = jax.jit(
        lambda: model_fast.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            None, batch["num_points"], batch["coordinates"],
            train=False,
            points=fast_batch["points_flat"],
            point_pillar=fast_batch["point_pillar"],
        )
    )()
    for k in out_c:
        err = float(jnp.max(jnp.abs(out_c[k] - out_f[k])))
        scale = float(jnp.max(jnp.abs(out_c[k])))
        log(f"parity {k}: max|err|={err:.3e} (scale {scale:.3f})")
        assert err < 2e-2 * max(scale, 0.1), (k, err)

    out_d = jax.jit(
        lambda: model_def.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            None, batch["num_points"], batch["coordinates"],
            train=False,
            points=fast_batch["points_flat"],
            point_pillar=fast_batch["point_pillar"],
        )
    )()
    for k in out_c:
        err = float(jnp.max(jnp.abs(out_c[k] - out_d[k])))
        scale = float(jnp.max(jnp.abs(out_c[k])))
        log(f"parity-def {k}: max|err|={err:.3e} (scale {scale:.3f})")
        assert err < 2e-2 * max(scale, 0.1), (k, err)

    # ---- 2. e2e fast-path train steps -----------------------------------
    step, init_rm = make_detection_train_step(model_fast, loss_cfg)
    rm = init_rm()
    st = jax.tree_util.tree_map(jnp.copy, state)
    losses = []
    for i in range(3):
        st, metrics, rm = step(st, fast_batch, rm)
        losses.append(float(metrics["loss"]))
    log(f"e2e fast-path train losses: {losses}")
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

    # ---- 3. scanned A/B --------------------------------------------------
    PROGS = {}

    def add_scan(name, m, b, precision):
        _, init_rm = make_detection_train_step(
            m, loss_cfg, precision=precision
        )
        scan_step = make_scan_detection_train_step(
            m, loss_cfg, precision=precision
        )
        progs = {}
        for k in KS:
            stacked = jax.tree_util.tree_map(
                lambda x, _k=k: jnp.broadcast_to(
                    x[None], (_k,) + x.shape
                ),
                b,
            )

            def call_k(st, rm, _scan=scan_step, _stacked=stacked):
                st, mk, rm = _scan(st, _stacked, rm)
                return st, rm, mk["loss"]

            progs[k] = (call_k, init_rm)
        PROGS[name] = progs

    add_scan("ppc_f32", model, batch, "fp32")
    add_scan("ppfast_f32", model_fast, fast_batch, "fp32")
    add_scan("ppfast_bf16", model_fast, fast_batch, "bf16")
    add_scan("ppdef_f32", model_def, fast_batch, "fp32")
    add_scan("ppdef_bf16", model_def, fast_batch, "bf16")

    prefixes = tuple(sys.argv[1:])
    if prefixes:
        PROGS = {
            n: p for n, p in PROGS.items()
            if any(n.startswith(pre) for pre in prefixes)
        }
        log(f"filtered programs: {sorted(PROGS)}")

    compiled = {}
    for name, prog in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            fn, init = prog[k]
            st = jax.tree_util.tree_map(jnp.copy, fx["state"])
            st, rm2, l = fn(st, init())
            np.asarray(l)
            compiled[(name, k)] = (fn, init)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(name, k):
        fn, init = compiled[(name, k)]
        h = {
            "s": jax.tree_util.tree_map(jnp.copy, fx["state"]),
            "rm": init(),
        }

        def call():
            h["s"], h["rm"], l = fn(h["s"], h["rm"])
            return l

        return fetch_forced_time(
            call, k_small=2, k_large=5, repeats=3
        ).step_s

    best = {key: float("inf") for key in compiled}
    for r in range(3):
        for name in PROGS:
            for k in KS:
                t = window(name, k)
                best[(name, k)] = min(best[(name, k)], t)
                log(f"round {r} {name} K={k}: {t*1e3:.2f} ms")

    out = {}
    for name in PROGS:
        t4, t16 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t16 - t4) / (KS[1] - KS[0])
        bound = t16 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[name] = {
            "step_ms": step_ms,
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_ms:.3f} ms/iter")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
