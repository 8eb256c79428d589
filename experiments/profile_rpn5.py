"""Per-block RPN cost at the r5 production defaults (s2d opening,
batch-folded 64-ch block, deferred upsampling), bf16.

profile_rpn's r4 rows measured the CLASSIC blocks; after the fast-path
default flips its per-block sums no longer describe the deployed step.
Programs (scanned K=(4,16), carry-dependent params, interleaved
best-of-3 in ONE process):

  b1    _ConvBlock(64, 3, s2, s2d_input, batch_fold) fwd+bwd
        on the s2d canvas [2, 249, 217, 256]
  b2    _ConvBlock(128, 5, s2) fwd+bwd on [2, 248, 216, 64]
  b3    _ConvBlock(256, 5, s2) fwd+bwd on [2, 124, 108, 128]
  rpn   full RPN fwd+bwd (s2d_input, deferred_upsample, batch_fold)
        -> deconv+BN+heads share = rpn - b1 - b2 - b3

Run: timeout 4000 python experiments/profile_rpn5.py [name ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_rpn5.log", "a", buffering=1)


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
    cast = jnp.bfloat16

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

    def add_mod(name, mod, shape, sum_tree=False):
        x32 = jnp.asarray(rs.randn(*shape).astype(np.float32))
        variables = mod.init(rng, x32, train=False)
        p32 = variables["params"]
        bs = variables.get("batch_stats", {})
        x0 = x32.astype(cast)
        p0 = jax.tree_util.tree_map(
            lambda a: a.astype(cast)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, p32
        )

        def body(carry, i, _mod=mod, _bs=bs):
            p, x = carry

            def loss(p, x):
                out, _ = _mod.apply(
                    {"params": p, "batch_stats": _bs}, x,
                    train=True, mutable=["batch_stats"],
                )
                if sum_tree:
                    return sum(
                        v.astype(jnp.float32).mean()
                        for v in out.values()
                    )
                return out.astype(jnp.float32).mean()

            gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
            p = jax.tree_util.tree_map(
                lambda a, b: a - cast(1e-9) * b.astype(a.dtype), p, gp
            )
            return (p, x - cast(1e-9) * gx)

        PROGS[name] = scan_prog(
            body,
            lambda _p=p0, _x=x0: (
                jax.tree_util.tree_map(jnp.copy, _p), jnp.copy(_x)
            ),
        )

    add_mod(
        "b1",
        _ConvBlock(64, 3, 2, s2d_input=True, batch_fold=True),
        (2, 249, 217, 256),
    )
    add_mod("b2", _ConvBlock(128, 5, 2), (2, 248, 216, 64))
    add_mod("b3", _ConvBlock(256, 5, 2), (2, 124, 108, 128))
    add_mod(
        "rpn",
        RPN(s2d_input=True, deferred_upsample=True, batch_fold=True),
        (2, 249, 217, 256),
        sum_tree=True,
    )

    names = tuple(sys.argv[1:])
    if names:
        PROGS = {n: p for n, p in PROGS.items() if n in names}
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
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

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
        log(f"RESULT {name}: {step_ms:.3f} ms/iter")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
