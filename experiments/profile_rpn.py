"""RPN conv-stack microbench: per-block fwd cost, fp32 vs bf16.

profile_infer put the network forward at 4.5 of 6.75 ms/frame and
profile_pp's fwd stage confirms the RPN dominates the PointPillars
step. At ~137 GFLOP/call the measured ~9 ms/call forward is ≈9% MFU —
this isolates which block and precision is responsible.

Programs (each scanned K=(4,16), carry-dependent, interleaved
best-of-3 rounds in ONE process):

  b1_f32 / b1_bf16    _ConvBlock(64, 3, s2)  on [2, 496, 432, 64]
  b2_f32 / b2_bf16    _ConvBlock(128, 5, s2) on [2, 248, 216, 64]
  b3_f32 / b3_bf16    _ConvBlock(256, 5, s2) on [2, 124, 108, 128]
  rpn_f32 / rpn_bf16  full RPN fwd (blocks + deconv concat + heads)
  rpnb_f32 / rpnb_bf16 full RPN fwd+bwd
  gb1_* / gb2_* / gb3_*  per-block fwd+bwd (wrt params+input)
  nb1_* — b1 fwd+bwd with use_norm=False (isolates the BN share)

Run: timeout 3000 python experiments/profile_rpn.py [name-prefix ...]

Optional argv prefixes filter the program set (e.g. `b rpn_` runs the
blocks and the fwd-only RPN programs; `rpnb_` runs just the heavy
fwd+bwd ones) so risky compiles can be isolated one per process —
the relay degrades when a process dies mid-compile (CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_rpn.log", "a", buffering=1)


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

    from papc_tpu.detect.model import RPN, _ConvBlock
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)
    KS = (4, 16)

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

    def add_block(name, filters, n_layers, stride, shape):
        mod = _ConvBlock(filters, n_layers, stride)
        x32 = jnp.asarray(rs.randn(*shape).astype(np.float32))
        variables = mod.init(rng, x32, train=False)
        p32 = variables["params"]
        bs = variables.get("batch_stats", {})
        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = x32.astype(cast)
            p = jax.tree_util.tree_map(
                lambda a: a.astype(cast)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p32
            )

            def body(c, i, _mod=mod, _x=x, _p=p, _bs=bs, _cast=cast):
                out, _ = _mod.apply(
                    {"params": _p, "batch_stats": _bs},
                    _x + _cast(1e-6) * c.astype(_cast),
                    train=True, mutable=["batch_stats"],
                )
                return c + out.astype(jnp.float32).mean()

            PROGS[f"{name}_{prec}"] = scan_prog(
                body, lambda: jnp.zeros(())
            )

    add_block("b1", 64, 3, 2, (2, 496, 432, 64))
    add_block("b2", 128, 5, 2, (2, 248, 216, 64))
    add_block("b3", 256, 5, 2, (2, 124, 108, 128))

    def add_block_bwd(name, filters, n_layers, stride, shape,
                      use_norm=True):
        mod = _ConvBlock(filters, n_layers, stride, use_norm=use_norm)
        x32 = jnp.asarray(rs.randn(*shape).astype(np.float32))
        variables = mod.init(rng, x32, train=False)
        p32 = variables["params"]
        bs = variables.get("batch_stats", {})
        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x0 = x32.astype(cast)
            p0 = jax.tree_util.tree_map(
                lambda a: a.astype(cast)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p32
            )

            def body(carry, i, _mod=mod, _bs=bs, _cast=cast):
                p, x = carry

                def loss(p, x):
                    out, _ = _mod.apply(
                        {"params": p, "batch_stats": _bs}, x,
                        train=True, mutable=["batch_stats"],
                    )
                    return out.astype(jnp.float32).mean()

                gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - _cast(1e-9) * b.astype(a.dtype),
                    p, gp,
                )
                return (p, x - _cast(1e-9) * gx)

            PROGS[f"{name}_{prec}"] = scan_prog(
                body,
                lambda _p=p0, _x=x0: (
                    jax.tree_util.tree_map(jnp.copy, _p), jnp.copy(_x)
                ),
            )

    add_block_bwd("gb1", 64, 3, 2, (2, 496, 432, 64))
    add_block_bwd("gb2", 128, 5, 2, (2, 248, 216, 64))
    add_block_bwd("gb3", 256, 5, 2, (2, 124, 108, 128))
    add_block_bwd("nb1", 64, 3, 2, (2, 496, 432, 64), use_norm=False)

    rpn = RPN()
    x32 = jnp.asarray(rs.randn(2, 496, 432, 64).astype(np.float32))
    variables = rpn.init(rng, x32, train=False)
    p32, bs = variables["params"], variables.get("batch_stats", {})
    for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = x32.astype(cast)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(cast)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, p32
        )

        def fwd_body(c, i, _x=x, _p=p, _cast=cast):
            out, _ = rpn.apply(
                {"params": _p, "batch_stats": bs},
                _x + _cast(1e-6) * c.astype(_cast),
                train=True, mutable=["batch_stats"],
            )
            return c + out["cls_preds"].astype(jnp.float32).mean()

        PROGS[f"rpn_{prec}"] = scan_prog(fwd_body, lambda: jnp.zeros(()))

        def fb_body(carry, i, _x=x, _cast=cast):
            p = carry

            def loss(p):
                out, _ = rpn.apply(
                    {"params": p, "batch_stats": bs}, _x,
                    train=True, mutable=["batch_stats"],
                )
                return sum(
                    v.astype(jnp.float32).mean() for v in out.values()
                )

            g = jax.grad(loss)(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - _cast(1e-9) * b.astype(a.dtype), p, g
            )

        PROGS[f"rpnb_{prec}"] = scan_prog(
            fb_body,
            lambda _p=p: jax.tree_util.tree_map(jnp.copy, _p),
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
