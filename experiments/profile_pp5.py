"""Current-defaults PointPillars step attribution (r5).

The r4 profiles (profile_pp/ppb/rpn) predate the fast-path defaults
(flat PFN, s2d scatter, fused heads, deferred upsampling); their sums
no longer reconcile with the 18.0 ms bf16 scanned step. This rebuilds
the attribution with CUMULATIVE scanned arms at today's defaults, each
carry-dependent, K=(4,16) slope, interleaved best-of in ONE process:

  pfn     flat PFN fwd+bwd (wrt params)
  scat    + s2d BEV scatter
  net     full network fwd+bwd (PFN+scatter+RPN)
  loss    + compute_loss (loss math, no metrics/opt)
  step    the deployed scanned train step (metrics+Adam included)

Run: timeout 4000 python experiments/profile_pp5.py [bf16|fp32]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_pp5.log", "a", buffering=1)


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
    from papc_tpu.detect.train import make_scan_detection_train_step
    from papc_tpu.utils.timing import fetch_forced_time

    precs = sys.argv[1:] or ["bf16", "fp32"]
    # PP5_STAGES=pfn,scat,net isolates risky compiles one per process
    # (the relay degrades when a process dies mid-compile — CLAUDE.md)
    stages = tuple(
        os.environ.get("PP5_STAGES", "pfn,scat,net,loss,step").split(",")
    )
    log(f"devices: {jax.devices()} precs={precs} stages={stages}")
    fx = bench._pointpillars_fixture()
    model, loss_cfg, batch = fx["model"], fx["loss_cfg"], fx["batch"]
    state = fx["state"]
    KS = (4, 16)
    rs = np.random.RandomState(0)

    from papc_tpu.detect.model import (
        RPN,
        PillarFeatureNetFlat,
        PointPillarsScatter,
    )
    from papc_tpu.train.precision import cast_floating

    use_s2d = model.scatter_s2d and model.ny % 2 == 0
    pfn_mod = PillarFeatureNetFlat(
        num_filters=model.pfn_num_filters,
        voxel_size=model.voxel_size,
        pc_range=model.pc_range,
        with_distance=model.with_distance,
        use_norm=model.use_norm,
        max_points_per_pillar=model.max_points_per_pillar,
    )
    scat_mod = PointPillarsScatter(model.ny, model.nx, s2d=use_s2d)
    rpn_mod = RPN(
        num_class=model.num_class,
        layer_nums=model.rpn_layer_nums,
        layer_strides=model.rpn_layer_strides,
        num_filters=model.rpn_num_filters,
        upsample_strides=model.rpn_upsample_strides,
        num_upsample_filters=model.rpn_num_upsample_filters,
        num_anchor_per_loc=model.num_anchor_per_loc,
        encode_background_as_zeros=model.encode_background_as_zeros,
        use_direction_classifier=model.use_direction_classifier,
        use_norm=model.use_norm,
        box_code_size=model.box_code_size,
        s2d_input=use_s2d,
        deferred_upsample=model.rpn_deferred_upsample,
        batch_fold=model.rpn_batch_fold,
    )

    def make_apply(upto, prec):
        """Network apply cut at a stage; returns scalar f(ptrees, eps)
        differentiated wrt the param trees (so weight-grad matmuls are
        live, matching the train step's backward)."""
        bf16 = prec == "bf16"

        def f(ptrees, eps):
            pparams, rparams = ptrees
            if bf16:
                pparams = cast_floating(pparams, jnp.bfloat16)
                rparams = cast_floating(rparams, jnp.bfloat16)
            pts = batch["points_flat"]
            if bf16:
                pts = pts.astype(jnp.bfloat16)
            pts = pts + eps.astype(pts.dtype)
            vf = pfn_mod.apply(
                {
                    "params": pparams,
                    "batch_stats": state.batch_stats["pfn"],
                },
                pts, batch["point_pillar"], batch["num_points"],
                batch["coordinates"], True,
                mutable=["batch_stats"],
            )[0]
            if upto == "pfn":
                return vf.astype(jnp.float32).sum()
            canvas = scat_mod.apply(
                {}, vf, batch["coordinates"]
            )
            if upto == "scat":
                return canvas.astype(jnp.float32).sum()
            preds = rpn_mod.apply(
                {
                    "params": rparams,
                    "batch_stats": state.batch_stats["rpn"],
                },
                canvas, train=True, mutable=["batch_stats"],
            )[0]
            if upto == "net":
                return sum(
                    v.astype(jnp.float32).sum() for v in preds.values()
                )
            loss, _ = compute_loss(
                preds, batch["labels"], batch["reg_targets"],
                batch["anchors"], loss_cfg,
            )
            return loss.astype(jnp.float32)

        return f

    PROGS = {}
    for prec in precs:
        for upto in ("pfn", "scat", "net", "loss"):
            if upto not in stages:
                continue
            f = make_apply(upto, prec)

            def body(c, i, _f=f):
                g = jax.grad(_f)(
                    (state.params["pfn"], state.params["rpn"]),
                    jnp.zeros((), jnp.float32) + 1e-30 * c,
                )
                # consume EVERY grad leaf — consuming only leaves[0]
                # lets XLA prune all other wgrad matmuls (first run of
                # this profile understated the backward by ~4 ms)
                acc = sum(
                    leaf.astype(jnp.float32).sum()
                    for leaf in jax.tree_util.tree_leaves(g)
                )
                return c + 1e-12 * acc

            name = f"{upto}_{prec}"
            progs = {}
            for k in KS:
                def run(carry, _k=k, _body=body):
                    def stp(c, i):
                        return _body(c, i), ()
                    c, _ = lax.scan(stp, carry, jnp.arange(_k))
                    return c
                progs[k] = jax.jit(run, donate_argnums=(0,))
            PROGS[name] = ("scalar", progs)

        if "step" in stages:
            scan_step = make_scan_detection_train_step(
                model, loss_cfg, precision=prec
            )
            from papc_tpu.detect.train import make_detection_train_step

            _, init_rm = make_detection_train_step(
                model, loss_cfg, precision=prec
            )
            PROGS[f"step_{prec}"] = ("step", (scan_step, init_rm))

    compiled = {}
    for name, (kind, progs) in PROGS.items():
        if kind == "scalar":
            for k in KS:
                log(f"compile {name} K={k} ...")
                t0 = time.perf_counter()
                c = progs[k](jnp.zeros(()))
                np.asarray(c)
                compiled[(name, k)] = progs[k]
                log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")
        else:
            scan_step, init_rm = progs
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
                np.asarray(mk["loss"][0])
                compiled[(name, k)] = (scan_step, stacked, init_rm)
                log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(name, k):
        ent = compiled[(name, k)]
        if isinstance(ent, tuple):
            scan_step, stacked, init_rm = ent
            holder = {
                "s": jax.tree_util.tree_map(jnp.copy, state),
                "rm": init_rm(),
            }

            def call():
                holder["s"], mk, holder["rm"] = scan_step(
                    holder["s"], stacked, holder["rm"]
                )
                return mk["loss"]
        else:
            holder = {"c": jnp.zeros(())}

            def call():
                holder["c"] = ent(holder["c"])
                return holder["c"]

        return fetch_forced_time(
            call, k_small=2, k_large=5, repeats=3
        ).step_s

    best = {key: float("inf") for key in compiled}
    for r in range(3):
        for name in PROGS:
            for k in KS:
                t = window(name, k)
                best[(name, k)] = min(best[(name, k)], t)
                log(f"round {r} {name} K={k}: {t * 1e3:.2f} ms")

    out = {}
    prev = {}
    for name in PROGS:
        t4, t16 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t16 - t4) / (KS[1] - KS[0])
        bound = t16 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        prec = name.rsplit("_", 1)[1]
        delta = step_ms - prev.get(prec, 0.0)
        prev[prec] = step_ms
        out[name] = {
            "step_ms": round(step_ms, 3),
            "delta_ms": round(delta, 3),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_ms:.3f} ms (+{delta:.3f})")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
