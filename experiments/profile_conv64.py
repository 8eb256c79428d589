"""Why is the RPN's 64-channel block 5x slower per-conv than block2?

profile_rpn r4: block1 (4 convs, C=64, big spatial) = 6.12 ms fwd+bwd
without BN; block2 (6 convs, C=128, SAME per-conv FLOPs) = 1.81 ms →
1.53 vs 0.30 ms per conv. Theory: C=64 is half the 128-lane minor dim,
so every load/store and MXU output tile runs half empty. Candidate
fix: zero-pad the convs to 128 channels (kernel rows/cols padded with
zeros preserve the math exactly; the layout already pads the memory).

Programs (fwd+bwd wrt params+input, scanned K=(4,16) slope,
interleaved best-of in ONE process):

  cs_*    stride-2 3x3 conv 64->64 on [2, 496, 432, 64]
  cp_*    SAME 3x3 conv 64->64 on [2, 248, 216, 64]
  csp_*   cs with channels zero-padded to 128 (in+kernel+out)
  cpp_*   cp with channels zero-padded to 128

Run: timeout 3000 python experiments/profile_conv64.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_conv64.log", "a", buffering=1)


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

    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    rs = np.random.RandomState(0)
    KS = (4, 16)
    DN = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, stride):
        return lax.conv_general_dilated(
            x, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=DN,
        )

    PROGS = {}

    def addg(name, shape):
        # batch folded into channels via feature_group_count: same
        # FLOPs, full 128-lane buffers (64-ch maps waste half of every
        # (8,128) tile). [B, H, W, C] -> [1, H, W, B*C], groups=B.
        B, H, W, C = shape
        x32 = (
            rs.randn(B, H, W, C).astype(np.float32)
            .transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
        )
        k32 = (rs.randn(3, 3, C, B * C) * 0.05).astype(np.float32)

        def gconv(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=DN, feature_group_count=B,
            )

        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x0 = jnp.asarray(x32).astype(cast)
            k0 = jnp.asarray(k32).astype(cast)

            def body(carry, i, _cast=cast):
                k, x = carry

                def loss(k, x):
                    return gconv(x, k).astype(jnp.float32).mean()

                gk, gx = jax.grad(loss, argnums=(0, 1))(k, x)
                return (k - _cast(1e-9) * gk, x - _cast(1e-9) * gx)

            progs = {}
            for kk in KS:
                def run(carry, _k=kk, _body=body):
                    def step(c, i):
                        return _body(c, i), ()

                    c, _ = lax.scan(step, carry, jnp.arange(_k))
                    return c

                progs[kk] = (
                    jax.jit(run, donate_argnums=(0,)),
                    lambda _k0=k0, _x0=x0: (jnp.copy(_k0), jnp.copy(_x0)),
                )
            PROGS[f"{name}_{prec}"] = progs

    def add(name, shape, stride, pad_to=None):
        cin = shape[-1]
        x32 = rs.randn(*shape).astype(np.float32)
        k32 = (rs.randn(3, 3, cin, cin) * 0.05).astype(np.float32)
        if pad_to:
            x32 = np.pad(x32, [(0, 0)] * 3 + [(0, pad_to - cin)])
            k32 = np.pad(
                k32, [(0, 0)] * 2 + [(0, pad_to - cin)] * 2
            )
        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x0 = jnp.asarray(x32).astype(cast)
            k0 = jnp.asarray(k32).astype(cast)

            def body(carry, i, _s=stride, _cast=cast):
                k, x = carry

                def loss(k, x):
                    return conv(x, k, _s).astype(jnp.float32).mean()

                gk, gx = jax.grad(loss, argnums=(0, 1))(k, x)
                return (k - _cast(1e-9) * gk, x - _cast(1e-9) * gx)

            progs = {}
            for kk in KS:
                def run(carry, _k=kk, _body=body):
                    def step(c, i):
                        return _body(c, i), ()

                    c, _ = lax.scan(step, carry, jnp.arange(_k))
                    return c

                progs[kk] = (
                    jax.jit(run, donate_argnums=(0,)),
                    lambda _k0=k0, _x0=x0: (jnp.copy(_k0), jnp.copy(_x0)),
                )
            PROGS[f"{name}_{prec}"] = progs

    add("cs", (2, 496, 432, 64), 2)
    add("cp", (2, 248, 216, 64), 1)
    add("csp", (2, 496, 432, 64), 2, pad_to=128)
    add("cpp", (2, 248, 216, 64), 1, pad_to=128)
    addg("cg", (2, 248, 216, 64))

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
            np.asarray(jax.tree_util.tree_leaves(c)[0][0, 0])
            compiled[(name, k)] = (fn, init)
            log(f"  compiled+ran in {time.perf_counter()-t0:.1f}s")

    def window(name, k):
        fn, init = compiled[(name, k)]
        h = {"c": init()}

        def call():
            h["c"] = fn(h["c"])
            return jax.tree_util.tree_leaves(h["c"])[0][0, 0, 0]

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
