"""Verify + A/B the [B, C, A] loss layout rewrite on the real chip.

compute_loss (new, channel-sublane [B, C, A]) vs compute_loss_bac
(reference-layout oracle, [B, A, C] — lane-pads C in {1, 2, 7} to 128).
profile_ppb r4 measured the oracle's fwd+bwd at 2.504 ms of the 32.6 ms
PointPillars step; the rewrite should collapse that.

Three parts in ONE process (relay rules: interleaved best-of, K-slope):
  1. parity: new-vs-oracle loss value + head-map grads on the chip
  2. e2e: 3 real jitted detection train steps (loss finite & decreasing)
  3. lossca_f32 vs lossbac_f32 fwd+bwd scanned K=(4,16) slope

Run: timeout 3000 python experiments/ab_loss_layout.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_loss_layout.log", "a", buffering=1)


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
    from papc_tpu.detect.detector import compute_loss, compute_loss_bac
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    loss_cfg = fx["loss_cfg"]
    KS = (4, 16)

    rs = np.random.RandomState(0)
    B = batch["labels"].shape[0]
    ny2, nx2 = model.ny // 2, model.nx // 2
    na, code = model.num_anchor_per_loc, model.box_code_size
    preds0 = {
        "box_preds": jnp.asarray(
            rs.randn(B, ny2, nx2, na * code).astype(np.float32)
        ),
        "cls_preds": jnp.asarray(
            rs.randn(B, ny2, nx2, na * model.num_class).astype(np.float32)
        ),
        "dir_cls_preds": jnp.asarray(
            rs.randn(B, ny2, nx2, na * 2).astype(np.float32)
        ),
    }

    # ---- 1. on-chip parity (loss + grads) --------------------------------
    def lval(fn, preds):
        l, _ = fn(
            preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], loss_cfg,
        )
        return l

    for tag, fn in (("ca", compute_loss), ("bac", compute_loss_bac)):
        pass  # compiled below

    l_ca, g_ca = jax.jit(
        lambda p: jax.value_and_grad(lambda q: lval(compute_loss, q))(p)
    )(preds0)
    l_bac, g_bac = jax.jit(
        lambda p: jax.value_and_grad(lambda q: lval(compute_loss_bac, q))(p)
    )(preds0)
    l_ca, l_bac = float(l_ca), float(l_bac)
    gerr = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ca), jax.tree_util.tree_leaves(g_bac)
        )
    )
    log(f"parity loss: ca={l_ca:.6f} bac={l_bac:.6f} |grad err|={gerr:.2e}")
    assert abs(l_ca - l_bac) < 1e-3 * max(1.0, abs(l_bac)), (l_ca, l_bac)
    assert gerr < 1e-4, gerr

    # ---- 2. real detection train steps ----------------------------------
    from papc_tpu.detect.train import make_detection_train_step

    step, init_rm = make_detection_train_step(model, loss_cfg)
    rm = init_rm()
    st = state
    losses = []
    for i in range(3):
        st, metrics, rm = step(st, batch, rm)
        losses.append(float(metrics["loss"]))
    log(f"e2e train losses: {losses}")
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

    # ---- 3. interleaved fwd+bwd K-slope A/B ------------------------------
    def make_body(fn):
        def body(carry, i):
            preds = carry
            g = jax.grad(lambda p: lval(fn, p))(preds)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-12 * b, preds, g
            )
        return body

    PROGS = {}
    for tag, fn in (("lossca", compute_loss), ("lossbac", compute_loss_bac)):
        body = make_body(fn)
        progs = {}
        for k in KS:
            def run(carry, _k=k, _body=body):
                def sstep(c, i):
                    return _body(c, i), ()
                c, _ = lax.scan(sstep, carry, jnp.arange(_k))
                return c
            progs[k] = (
                jax.jit(run, donate_argnums=(0,)),
                lambda: jax.tree_util.tree_map(jnp.copy, preds0),
            )
        PROGS[f"{tag}_f32"] = progs

    compiled = {}
    for name, prog in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            fn, init = prog[k]
            c = fn(init())
            np.asarray(jax.tree_util.tree_leaves(c)[0])
            compiled[(name, k)] = (fn, init)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(name, k):
        fn, init = compiled[(name, k)]
        h = {"c": init()}

        def call():
            h["c"] = fn(h["c"])
            return jax.tree_util.tree_leaves(h["c"])[0]

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
