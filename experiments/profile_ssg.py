"""Decompose the PointNet++ SSG train step (B=32, N=1024) into
component scan-slope timings, all in ONE process.

The r4 mode A/B showed recompute1 (single-launch SA-MLP passes) does
NOT beat stream — so the ~6.5 ms between the measured 14.3 ms step and
the 7.6 ms HBM roofline is NOT Mosaic grid-step overhead. This measures
where it actually goes: each component below is scanned K times inside
one jit (carry-dependent so nothing constant-folds), timed by the
K=8/32 slope with fetch-forced windows.

Components:
  full      — the production scanned train step (fused stream)
  fwd       — forward+loss only (no grad, no optimizer)
  geom      — fps+ball-query+gathers for SA1+SA2 (forward only)
  geom_bwd  — gather backward (scatter-add) at SA1+SA2 shapes
  mlp1/2/3  — fused SA-MLP fwd+bwd per level shape
  head      — classifier head fwd+bwd
  opt       — Adam update alone on the full param tree

Run: timeout 3000 python experiments/profile_ssg.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_ssg.log", "a", buffering=1)


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

    from papc_tpu.models import init_model
    from papc_tpu.ops import fused_mlp, index_points, query_ball_point
    from papc_tpu.ops.sampling import farthest_point_sample
    from papc_tpu.train.trainer import (
        create_train_state,
        make_scan_train_step,
        make_train_step,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    B, N = 32, 1024
    rs = np.random.RandomState(0)
    xyz_np = rs.randn(B, N, 3).astype(np.float32)
    batch = {
        "points": jnp.asarray(xyz_np),
        "label": jnp.asarray(rs.randint(0, 16, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    rng = jax.random.PRNGKey(0)
    spec = init_model("pointnet2_ssg", "clas", num_classes=16)
    state = create_train_state(spec, rng, batch)


    def fresh(tree_builder):
        """Init builder returning fresh copies (donation-safe)."""
        def build():
            import jax.numpy as _jnp
            return jax.tree_util.tree_map(_jnp.copy, tree_builder())
        return build
    KS = (8, 32)
    progs = {}  # name -> {k: (jitted_fn, args_builder)}

    def scan_jit(body, init_builder):
        """Return per-K jitted programs scanning `body` K times."""
        out = {}
        for k in KS:
            def run(carry, _k=k, _body=body):
                def step(c, i):
                    c2, _ = _body(c, i)
                    return c2, ()
                c, _ = lax.scan(step, carry, jnp.arange(_k))
                return c
            out[k] = (jax.jit(run, donate_argnums=(0,)), fresh(init_builder))
        return out

    # ---- full: production scanned step --------------------------------
    with fused_mlp.override(enable=True, mode="stream"):
        full = {}
        for k in KS:
            scan_step = make_scan_train_step(spec, k)
            stacked = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch
            )
            full[k] = (scan_step, stacked)

        # ---- fwd: forward+loss only -----------------------------------
        ts, _ = make_train_step(spec)
        import papc_tpu.train.metrics as M
        from papc_tpu.train.trainer import model_inputs, targets_of

        def fwd_body(carry, i):
            loss_acc, params, bstats = carry
            inputs = model_inputs(spec, batch)
            out, mutated = spec.model.apply(
                {"params": params, "batch_stats": bstats},
                *inputs, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, i)},
            )
            loss = M.softmax_cross_entropy(
                out.astype(jnp.float32), targets_of(spec, batch),
                batch["mask"],
            )
            return (loss_acc + loss, params, mutated["batch_stats"]), i

        def fwd_init():
            return (jnp.zeros(()), state.params, state.batch_stats)

        def fwd_scan(carry, _body=fwd_body):
            def step(c, i):
                c2, _ = _body(c, i)
                return c2, ()
            c, _ = lax.scan(step, carry, jnp.arange(fwd_scan.k))
            return c

        fwd = {}
        for k in KS:
            def mk(k):
                def run(carry):
                    def step(c, i):
                        c2, _ = fwd_body(c, i)
                        return c2, ()
                    c, _ = lax.scan(step, carry, jnp.arange(k))
                    return c
                return jax.jit(run, donate_argnums=(0,))
            fwd[k] = (mk(k), fresh(fwd_init))

    # ---- geom: fps + ball query + gathers, SA1+SA2 ---------------------
    xyz = jnp.asarray(xyz_np)
    feat512 = jnp.asarray(rs.randn(B, 512, 128).astype(np.float32))

    def geom_body(carry, i):
        acc = carry
        x = xyz + 1e-12 * acc  # carry-dependent: no constant folding
        idx1 = farthest_point_sample(x, 512)
        nx1 = index_points(x, idx1)
        bidx1 = query_ball_point(0.2, 32, x, nx1)
        g1 = index_points(x, bidx1)  # [B,512,32,3]
        idx2 = farthest_point_sample(nx1, 128)
        nx2 = index_points(nx1, idx2)
        bidx2 = query_ball_point(0.4, 64, nx1, nx2)
        g2x = index_points(nx1, bidx2)  # [B,128,64,3]
        g2f = index_points(feat512, bidx2)  # [B,128,64,128]
        return (acc + g1.sum() + g2x.sum() + g2f.sum()), i

    geom = scan_jit(geom_body, lambda: jnp.zeros(()))

    # ---- geom_bwd: gather backward = scatter-add at SA shapes ----------
    bidx1_c = query_ball_point(
        0.2, 32, xyz, index_points(xyz, farthest_point_sample(xyz, 512))
    )
    feat1024 = jnp.asarray(rs.randn(B, N, 64).astype(np.float32))
    nx1_c = index_points(xyz, farthest_point_sample(xyz, 512))
    bidx2_c = query_ball_point(
        0.4, 64, nx1_c, index_points(nx1_c, farthest_point_sample(nx1_c, 128))
    )

    def gbwd_body(carry, i):
        f1, f2 = carry

        def loss(f1, f2):
            a = index_points(f1, bidx1_c).sum()
            b = index_points(f2, bidx2_c).sum()
            return a + b

        g1, g2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
        return (f1 - 1e-12 * g1, f2 - 1e-12 * g2), i

    geom_bwd = scan_jit(
        gbwd_body, lambda: (feat1024, feat512)
    )

    # ---- mlp{1,2,3}: fused SA-MLP fwd+bwd per level --------------------
    def make_mlp_prog(name, b, s, k_nbr, c0, widths):
        g = jnp.asarray(
            rs.randn(b, s, k_nbr, c0).astype(np.float32)
        )
        params = []
        running = []
        cins = (c0,) + tuple(widths[:-1])
        for cin, f in zip(cins, widths):
            params.append((
                jnp.asarray(rs.randn(cin, f).astype(np.float32)) * 0.05,
                jnp.zeros((f,), jnp.float32),
                jnp.ones((f,), jnp.float32),
                jnp.zeros((f,), jnp.float32),
            ))
            running.append((jnp.zeros((f,)), jnp.ones((f,))))
        running = tuple(running)

        def body(carry, i):
            ps = carry

            def loss(ps):
                with fused_mlp.override(enable=True, mode="stream"):
                    out, _ = fused_mlp.fused_mlp_max(
                        g, tuple(tuple(p) for p in ps), running,
                        train=True, **fused_mlp.call_opts(),
                    )
                return out.astype(jnp.float32).sum()

            grads = jax.grad(loss)(ps)
            return jax.tree_util.tree_map(
                lambda p, gg: p - 1e-12 * gg, ps, grads
            ), i

        return scan_jit(body, lambda: tuple(tuple(p) for p in params))

    with fused_mlp.override(enable=True, mode="stream"):
        mlp1 = make_mlp_prog("mlp1", B, 512, 32, 3, (64, 64, 128))
        mlp2 = make_mlp_prog("mlp2", B, 128, 64, 131, (128, 128, 256))
        mlp3 = make_mlp_prog("mlp3", B, 1, 128, 259, (256, 512, 1024))

    # ---- head: classifier head fwd+bwd ---------------------------------
    from papc_tpu.nn import MLPHead

    head_mod = MLPHead((512, 256), 16, dropout_rate=0.4, bn=True,
                       per_layer_dropout=True)
    hx = jnp.asarray(rs.randn(B, 1024).astype(np.float32))
    hvars = head_mod.init({"params": rng, "dropout": rng}, hx, train=False)

    def head_body(carry, i):
        p = carry

        def loss(p):
            out, _ = head_mod.apply(
                {"params": p, "batch_stats": hvars.get("batch_stats", {})},
                hx, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, i)},
            )
            return out.astype(jnp.float32).sum()

        gr = jax.grad(loss)(p)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-12 * b, p, gr
        ), i

    head = scan_jit(head_body, lambda: hvars["params"])

    # ---- opt: Adam update alone ----------------------------------------
    fixed_grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-6), state.params
    )

    def opt_body(carry, i):
        st = carry
        return st.apply_gradients(grads=fixed_grads), i

    opt = scan_jit(opt_body, lambda: state)

    COMPONENTS = {
        "full": None, "fwd": None, "geom": geom, "geom_bwd": geom_bwd,
        "mlp1": mlp1, "mlp2": mlp2, "mlp3": mlp3, "head": head,
        "opt": opt,
    }

    # compile everything up front, logging before each risky compile
    compiled = {}
    for name, prog in COMPONENTS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            if name == "full":
                scan_step, stacked = full[k]
                h = {"s": jax.tree_util.tree_map(jnp.copy, state)}
                h["s"], losses, _ = scan_step(h["s"], stacked, rng)
                float(losses[-1])
                compiled[(name, k)] = ("full", scan_step, stacked)
            elif name == "fwd":
                fn, init = fwd[k]
                c = fn(init())
                float(c[0])
                compiled[(name, k)] = ("gen", fn, init)
            else:
                fn, init = prog[k]
                c = fn(init())
                jax.tree_util.tree_map(
                    lambda x: np.asarray(jax.device_get(x)), c
                )
                compiled[(name, k)] = ("gen", fn, init)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(name, k):
        kind, fn, arg = compiled[(name, k)]
        if kind == "full":
            h = {"s": jax.tree_util.tree_map(jnp.copy, state)}

            def call():
                h["s"], losses, _ = fn(h["s"], arg, rng)
                return losses
        else:
            h = {"c": arg()}

            def call():
                h["c"] = fn(h["c"])
                leaf = jax.tree_util.tree_leaves(h["c"])[0]
                return leaf

        res = fetch_forced_time(call, k_small=2, k_large=5, repeats=3)
        return res.step_s

    best = {key: float("inf") for key in compiled}
    for r in range(3):
        for name in COMPONENTS:
            for k in KS:
                t = window(name, k)
                best[(name, k)] = min(best[(name, k)], t)
                log(f"round {r} {name} K={k}: {t*1e3:.2f} ms")

    out = {}
    for name in COMPONENTS:
        t8, t32 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[name] = {
            "step_ms": step_ms,
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_ms:.3f} ms/iter")
    parts = sum(
        out[n]["step_ms"]
        for n in ("geom", "geom_bwd", "mlp1", "mlp2", "mlp3", "head", "opt")
    )
    log(f"sum(parts)={parts:.2f} ms vs full={out['full']['step_ms']:.2f} "
        f"ms fwd={out['fwd']['step_ms']:.2f} ms")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
