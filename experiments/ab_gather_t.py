"""Isolated A/B: channel-sublane gather/scatter vs the row-layout path.

profile_geom (r5) attributed the SSG geometry cost to the lane-padded
gathers: g1 fwd 1.32 ms / bwd 2.64 ms (SA1, C=3), g2f fwd 0.67 / bwd
0.79 ms (SA2, C=131). The transposed kernels (ops/pallas/gather_t.py)
move C to sublanes. Arms (scanned K=8/32 slope, interleaved best-of,
one process):

  sa1_row_fwd / sa1_t_fwd     gather [32,1024,3] by 16384 idx
  sa1_row_bwd / sa1_t_bwd     + backward scatter to 1024 rows
  sa2_row_fwd / sa2_t_fwd     gather [32,512,131] by 8192 idx
  sa2_row_bwd / sa2_t_bwd     + backward scatter to 512 rows

Run: timeout 3000 python experiments/ab_gather_t.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_gather_t.log", "a", buffering=1)


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

    from papc_tpu.ops.geometry import index_points
    from papc_tpu.ops.pallas.gather_t import gather_cols
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    rs = np.random.RandomState(0)
    KS = (8, 32)

    SHAPES = {
        "sa1": (32, 1024, 3, 16384),   # B, N, C, M
        "sa2": (32, 512, 131, 8192),
    }

    PROGS = {}
    for sname, (B, N, C, M) in SHAPES.items():
        src = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        src_t = jnp.asarray(np.asarray(src).transpose(0, 2, 1))
        idx = jnp.asarray(rs.randint(0, N, size=(B, M)).astype(np.int32))

        def row_fwd(c, i, _src=src, _idx=idx):
            out = index_points(_src + 1e-12 * c, _idx)
            return c + 1e-12 * out[:, 0, :].sum()

        def t_fwd(c, i, _src=src_t, _idx=idx):
            out = gather_cols(_src + 1e-12 * c, _idx)
            return c + 1e-12 * out[:, :, 0].sum()

        def row_bwd(c, i, _src=src, _idx=idx):
            g = jax.grad(
                lambda s: (index_points(s, _idx) ** 2).sum()
            )(_src + 1e-12 * c)
            return c + 1e-12 * g[:, 0, :].sum()

        def t_bwd(c, i, _src=src_t, _idx=idx):
            g = jax.grad(
                lambda s: (gather_cols(s, _idx) ** 2).sum()
            )(_src + 1e-12 * c)
            return c + 1e-12 * g[:, :, 0].sum()

        for arm, body in (("row_fwd", row_fwd), ("t_fwd", t_fwd),
                          ("row_bwd", row_bwd), ("t_bwd", t_bwd)):
            name = f"{sname}_{arm}"
            progs = {}
            for k in KS:
                def run(carry, _k=k, _body=body):
                    def step(c, i):
                        return _body(c, i), ()
                    c, _ = lax.scan(step, carry, jnp.arange(_k))
                    return c
                progs[k] = jax.jit(run, donate_argnums=(0,))
            PROGS[name] = progs

    compiled = {}
    for name, prog in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            c = prog[k](jnp.zeros(()))
            np.asarray(c)
            compiled[(name, k)] = prog[k]
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(name, k):
        fn = compiled[(name, k)]
        h = {"c": jnp.zeros(())}

        def call():
            h["c"] = fn(h["c"])
            return h["c"]

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
        t8, t32 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
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
