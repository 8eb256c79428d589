"""Isolate the PointPillars BACKWARD budget (r4: grad-loss = 23.3 ms).

profile_pp.py gave cumulative stages (fwd 6.2 / +loss 2.2 / +bwd 23.3 ms
fp32) and profile_rpn.py isolates the RPN conv stack. This covers the
rest of the backward with per-part fwd+bwd scanned programs, each
carry-dependent and donated, timed by the K=(4,16) slope in ONE process:

  pfnb_f32   PFN decorate+Dense/BN/ReLU/max fwd+bwd wrt params
  scatb_f32  pfn + BEV scatter fwd+bwd (adds the scatter transpose gather)
  lossb_f32  compute_loss fwd+bwd wrt the RPN head maps (loss math only)

(rpnb_* lives in profile_rpn.py — run `profile_rpn.py rpnb_` separately;
the relay degrades when a process dies mid-compile, so risky programs
stay one-per-process.)

Run: timeout 3000 python experiments/profile_ppb.py [name-prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_ppb.log", "a", buffering=1)


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
    from papc_tpu.detect.model import PillarFeatureNet, PointPillarsScatter
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    loss_cfg = fx["loss_cfg"]
    KS = (4, 16)

    pfn_mod = PillarFeatureNet(
        num_filters=tuple(model.pfn_num_filters),
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
        use_norm=model.use_norm,
    )
    scatter_mod = PointPillarsScatter(model.ny, model.nx)
    pfn_params = state.params["pfn"]
    pfn_stats = state.batch_stats["pfn"]

    def scan_prog(body, init_builder):
        out = {}
        for k in KS:
            def run(carry, _k=k, _body=body):
                def step(c, i):
                    return _body(c, i), ()
                c, _ = lax.scan(step, carry, jnp.arange(_k))
                return c
            out[k] = (jax.jit(run, donate_argnums=(0,)), init_builder)
        return out

    PROGS = {}

    def pfn_loss(params, with_scatter):
        feats, _ = pfn_mod.apply(
            {"params": params, "batch_stats": pfn_stats},
            batch["voxels"], batch["num_points"], batch["coordinates"],
            train=True, mutable=["batch_stats"],
        )
        if with_scatter:
            canvas = scatter_mod.apply({}, feats, batch["coordinates"])
            return canvas.astype(jnp.float32).sum()
        return feats.astype(jnp.float32).sum()

    def make_pfn_body(with_scatter):
        def body(carry, i):
            p = carry
            g = jax.grad(lambda q: pfn_loss(q, with_scatter))(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g
            )
        return body

    PROGS["pfnb_f32"] = scan_prog(
        make_pfn_body(False),
        lambda: jax.tree_util.tree_map(jnp.copy, pfn_params),
    )
    PROGS["scatb_f32"] = scan_prog(
        make_pfn_body(True),
        lambda: jax.tree_util.tree_map(jnp.copy, pfn_params),
    )

    # loss fwd+bwd wrt raw head maps (the shapes the RPN emits)
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

    def loss_body(carry, i):
        preds = carry

        def loss(preds):
            l, _ = compute_loss(
                preds, batch["labels"], batch["reg_targets"],
                batch["anchors"], loss_cfg,
            )
            return l

        g = jax.grad(loss)(preds)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-12 * b, preds, g
        )

    PROGS["lossb_f32"] = scan_prog(
        loss_body, lambda: jax.tree_util.tree_map(jnp.copy, preds0)
    )

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
