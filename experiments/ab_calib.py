"""Diagnose the matmul-chain ceiling behind calib_matmul_ms.

First r5 calib readings (0.94-1.28 ms for a 2048^3 bf16 matmul chain
step) imply ~18 TF/s — yet the PointPillars step achieves 2.4e13
FLOP/s, so the PROBE program must be leaving throughput on the floor
(not the chip). Arms (scanned K=16/64 slope, interleaved best-of, one
process):

  bf16out_2048   current probe: lax.dot bf16xbf16 -> bf16
  f32out_2048    preferred_element_type f32, cast back to bf16
  f32acc_2048    f32 chain, bf16-input dots (the samlp convention)
  bf16out_4096   size scaling check
  twochain_2048  two independent chains interleaved (ILP: serial-dep test)

Run: timeout 2500 python experiments/ab_calib.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_calib.log", "a", buffering=1)


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

    from papc_tpu.utils.timing import force

    log(f"devices: {jax.devices()}")
    KS = (16, 64)

    def mk_w(dim, seed):
        return (
            jax.random.normal(
                jax.random.PRNGKey(seed), (dim, dim), jnp.float32
            )
            / np.sqrt(dim)
        ).astype(jnp.bfloat16)

    def mk_x(dim, seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (dim, dim), jnp.float32
        ).astype(jnp.bfloat16)

    PROGS = {}

    def add(name, dim, body, init):
        for k in KS:
            @jax.jit
            def run(x, _k=k, _body=body):
                def step(c, _):
                    return _body(c), ()
                c, _ = lax.scan(step, x, None, length=_k)
                return c
            PROGS.setdefault(name, {})[k] = (run, init, 2.0 * dim**3)

    w2 = mk_w(2048, 0)
    add("bf16out_2048", 2048,
        lambda c: lax.dot(c, w2, preferred_element_type=jnp.bfloat16),
        lambda: mk_x(2048, 1))
    add("f32out_2048", 2048,
        lambda c: lax.dot(
            c, w2, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        lambda: mk_x(2048, 1))

    def f32acc(c):
        return lax.dot(
            c.astype(jnp.bfloat16), w2,
            preferred_element_type=jnp.float32,
        )

    add("f32acc_2048", 2048, f32acc,
        lambda: mk_x(2048, 1).astype(jnp.float32))

    w4 = mk_w(4096, 2)
    add("bf16out_4096", 4096,
        lambda c: lax.dot(c, w4, preferred_element_type=jnp.bfloat16),
        lambda: mk_x(4096, 3))

    def two(c):
        a, b = c
        return (
            lax.dot(a, w2, preferred_element_type=jnp.bfloat16),
            lax.dot(b, w2, preferred_element_type=jnp.bfloat16),
        )

    for k in KS:
        @jax.jit
        def run2(x, _k=k):
            def step(c, _):
                return two(c), ()
            c, _ = lax.scan(step, x, None, length=_k)
            return c
        PROGS.setdefault("twochain_2048", {})[k] = (
            run2,
            lambda: (mk_x(2048, 4), mk_x(2048, 5)),
            2 * 2.0 * 2048**3,
        )

    compiled = {}
    for name, progs in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            run, init, flops = progs[k]
            force(run(init()))
            compiled[(name, k)] = (run, init, flops)
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(name, k):
        run, init, _ = compiled[(name, k)]
        x = init()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(run(x))
            best = min(best, time.perf_counter() - t0)
        return best

    best = {key: float("inf") for key in compiled}
    for r in range(3):
        for name in PROGS:
            for k in KS:
                t = window(name, k)
                best[(name, k)] = min(best[(name, k)], t)
                log(f"round {r} {name} K={k}: {t * 1e3:.2f} ms/call")

    out = {}
    for name in PROGS:
        t16, t64 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t64 - t16) / (KS[1] - KS[0])
        bound = t64 / KS[1]
        step_s = slope if slope > 0 else bound
        flops = compiled[(name, KS[0])][2]
        tfs = flops / step_s / 1e12
        out[name] = {
            "step_ms": round(step_s * 1e3, 4),
            "tflops": round(tfs, 1),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_s * 1e3:.4f} ms = {tfs:.1f} TF/s")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
