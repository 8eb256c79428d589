"""Decompose the 4.3 ms step-vs-loss gap in the PointPillars bf16 step.

profile_pp5 (r5): pfn 2.00 / +scat 2.46 / +net 5.92 / +loss 0.95 →
11.32 ms, but the deployed scanned step measures 15.66 — the wrapper
(metrics + preds f32-cast aux + Adam + scan plumbing) adds 4.34 ms.
Arms (identical scanned structure, K=(4,16) slope, interleaved
best-of in ONE process, bf16):

  full   today's step_impl (value_and_grad aux returns f32-cast preds,
         running metrics update, Adam)
  nom    metrics updates removed (preds still aux-returned + f32-cast)
  noaux  metrics removed AND preds not returned (XLA prunes the
         lane-padded [B,H,W,C->128] f32 casts)
  sgd    noaux with plain SGD instead of Adam

full-nom = metrics; nom-noaux = preds-aux materialization;
noaux-sgd = Adam; sgd vs profile_pp5 loss stage = residual plumbing.

Run: timeout 4000 python experiments/ab_step_parts.py [arm ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_step_parts.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    import bench
    from papc_tpu.detect.detector import _heads_to_ca, compute_loss
    from papc_tpu.train.precision import cast_floating
    from papc_tpu.train.running_metrics import (
        AccuracyState,
        PrecisionRecallState,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, loss_cfg, batch = fx["model"], fx["loss_cfg"], fx["batch"]
    state = fx["state"]
    KS = (4, 16)

    def make_step(arm):
        metrics_on = arm == "full"
        aux_preds = arm in ("full", "nom")
        adam = arm != "sgd"

        def loss_fn(params, batch_stats, b):
            params = cast_floating(params, jnp.bfloat16)
            points = b["points_flat"].astype(jnp.bfloat16)
            preds, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                None, b["num_points"], b["coordinates"],
                train=True, points=points,
                point_pillar=b["point_pillar"],
                mutable=["batch_stats"],
            )
            preds = cast_floating(preds, jnp.float32)
            loss, metrics = compute_loss(
                preds, b["labels"], b["reg_targets"], b["anchors"],
                loss_cfg,
            )
            new_stats = cast_floating(
                mutated["batch_stats"], jnp.float32
            )
            if aux_preds:
                return loss, (metrics, preds, new_stats)
            return loss, (metrics, None, new_stats)

        tx = (
            optax.adam(2e-4)
            if adam
            else optax.sgd(2e-4)
        )
        opt0 = tx.init(state.params)

        def step_impl(params, opt_state, batch_stats, rm, b):
            (loss, (metrics, preds, new_stats)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch_stats, b
                )
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if metrics_on:
                B = b["labels"].shape[0]
                cls_preds = _heads_to_ca(
                    preds["cls_preds"], B, loss_cfg.num_class
                )
                rm = {
                    "acc": rm["acc"].update(
                        b["labels"], cls_preds, channel_axis=1
                    ),
                    "pr": rm["pr"].update(
                        b["labels"], cls_preds, channel_axis=1
                    ),
                }
            return params, opt_state, new_stats, rm, metrics["loss"]

        def init_carry():
            return (
                jax.tree_util.tree_map(jnp.copy, state.params),
                jax.tree_util.tree_map(jnp.copy, opt0),
                jax.tree_util.tree_map(jnp.copy, state.batch_stats),
                # copy the fresh scalar leaves: identical constants can
                # alias one buffer, tripping XLA's double-donate check
                jax.tree_util.tree_map(
                    jnp.copy,
                    {
                        "acc": AccuracyState.create(),
                        "pr": PrecisionRecallState.create(),
                    },
                ),
            )

        progs = {}
        for k in KS:
            stacked = jax.tree_util.tree_map(
                lambda x, _k=k: jnp.broadcast_to(
                    x[None], (_k,) + x.shape
                ),
                batch,
            )

            def run(carry, _stacked=stacked):
                def body(c, b):
                    p, o, bs, r = c
                    p, o, bs, r, loss = step_impl(p, o, bs, r, b)
                    return (p, o, bs, r), loss

                c, losses = lax.scan(body, carry, _stacked)
                return c, losses

            progs[k] = (
                jax.jit(run, donate_argnums=(0,)),
                init_carry,
            )
        return progs

    ARMS = sys.argv[1:] or ["full", "nom", "noaux", "sgd"]
    PROGS = {arm: make_step(arm) for arm in ARMS}

    compiled = {}
    for name, progs in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            fn, init = progs[k]
            c, losses = fn(init())
            np.asarray(losses)
            compiled[(name, k)] = (fn, init)
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(name, k):
        fn, init = compiled[(name, k)]
        h = {"c": init()}

        def call():
            h["c"], losses = fn(h["c"])
            return losses

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
    for name in PROGS:
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
