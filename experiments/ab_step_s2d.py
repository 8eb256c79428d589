"""Full PointPillars scanned train step: classic vs s2d scatter+conv,
plus residual decomposition (running metrics, Adam).

r4 budget so far (fp32): step 32.6 = RPN 14.2 + PFN/scatter 8.0 +
loss 2.5 (now 0.71 after the [B,C,A] rewrite) + ~7.9 UNACCOUNTED.
This run, all in ONE process (interleaved best-of, scan-slope):

  ppc_*     production scanned step, classic scatter (baseline)
  pps2d_*   production scanned step, scatter_s2d=True (ops/s2d.py —
            isolated conv A/B won 2.11 -> 1.25 ms f32)
  ppnorm_f32  classic step WITHOUT the running-metrics update
  ppsgd_f32   ppnorm with plain SGD instead of Adam (isolates opt cost)

Run: timeout 3000 python experiments/ab_step_s2d.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_step_s2d.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from papc_tpu.detect.detector import compute_loss
    from papc_tpu.detect.train import (
        make_detection_train_step,
        make_scan_detection_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    # pin configs: the fixture model follows builders' defaults
    # (s2d+flat since r4), so both arms are forced explicitly
    model = fx["model"].clone(scatter_s2d=False, pfn_flat=False)
    state, batch = fx["state"], fx["batch"]
    loss_cfg = fx["loss_cfg"]
    model_s2d = model.clone(scatter_s2d=True)
    KS = (4, 16)

    # on-chip parity: classic vs s2d head maps with the same params
    out_c = jax.jit(
        lambda: model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["voxels"], batch["num_points"], batch["coordinates"],
            train=False,
        )
    )()
    out_s = jax.jit(
        lambda: model_s2d.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["voxels"], batch["num_points"], batch["coordinates"],
            train=False,
        )
    )()
    for k in out_c:
        err = float(jnp.max(jnp.abs(out_c[k] - out_s[k])))
        scale = float(jnp.max(jnp.abs(out_c[k])))
        log(f"parity {k}: max|err|={err:.3e} (scale {scale:.3f})")
        assert err < 2e-2 * max(scale, 0.1), (k, err)

    PROGS = {}

    def add_scan(name, m, precision):
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
                batch,
            )

            def call_k(st, rm, _scan=scan_step, _stacked=stacked):
                st, mk, rm = _scan(st, _stacked, rm)
                return st, rm, mk["loss"]

            progs[k] = (call_k, init_rm)
        PROGS[name] = progs

    add_scan("ppc_f32", model, "fp32")
    add_scan("ppc_bf16", model, "bf16")
    add_scan("pps2d_f32", model_s2d, "fp32")
    add_scan("pps2d_bf16", model_s2d, "bf16")

    # ---- residual probes: no running metrics / no Adam ----------------
    def loss_fn(params, batch_stats):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["voxels"], batch["num_points"], batch["coordinates"],
            train=True, mutable=["batch_stats"],
        )
        loss, metrics = compute_loss(
            preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], loss_cfg,
        )
        return loss, mutated["batch_stats"]

    def add_custom(name, use_adam):
        progs = {}
        for k in KS:
            if use_adam:
                def body(carry, i):
                    st = carry
                    (l, new_stats), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(st.params, st.batch_stats)
                    st = st.apply_gradients(grads=grads)
                    return st.replace(batch_stats=new_stats), l

                init = lambda: jax.tree_util.tree_map(jnp.copy, state)
            else:
                def body(carry, i):
                    params, stats = carry
                    (l, new_stats), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, stats)
                    params = jax.tree_util.tree_map(
                        lambda p, g: p - 1e-9 * g, params, grads
                    )
                    return (params, new_stats), l

                init = lambda: (
                    jax.tree_util.tree_map(jnp.copy, state.params),
                    jax.tree_util.tree_map(jnp.copy, state.batch_stats),
                )

            def run(carry, _k=k, _body=body):
                c, ls = lax.scan(_body, carry, jnp.arange(_k))
                return c, ls

            progs[k] = (jax.jit(run, donate_argnums=(0,)), init)
        PROGS[name] = progs

    add_custom("ppnorm_f32", use_adam=True)
    add_custom("ppsgd_f32", use_adam=False)

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
            if name.startswith(("ppc", "pps2d")):
                st = jax.tree_util.tree_map(
                    jnp.copy, (fx["state"])
                )
                st, rm, l = fn(st, init())
                np.asarray(l)
            else:
                c, ls = fn(init())
                np.asarray(ls)
            compiled[(name, k)] = (fn, init)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(name, k):
        fn, init = compiled[(name, k)]
        if name.startswith(("ppc", "pps2d")):
            h = {
                "s": jax.tree_util.tree_map(jnp.copy, fx["state"]),
                "rm": init(),
            }

            def call():
                h["s"], h["rm"], l = fn(h["s"], h["rm"])
                return l

        else:
            h = {"c": init()}

            def call():
                h["c"], ls = fn(h["c"])
                return ls

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
