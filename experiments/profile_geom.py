"""Decompose the SSG geometry path (B=32, N=1024) op by op.

profile_ssg measured geom fwd 3.81 ms + geom bwd 3.84 ms of the
14.28 ms step. Pallas FPS at this shape is ~0.69 ms and Pallas ball
query ~0.20 ms, so the residual ~2.5 ms should be the index_points
gathers — this measures each op in isolation (scanned, carry-dependent,
K-slope), plus the scatter-add backward of each gather.

  fps1      FPS 1024 -> 512
  bq1       ball query r=0.2 K=32 over 1024, 512 queries
  g1        index_points [32,1024,3] by [32,512,32]   (6 MB out)
  fps2      FPS 512 -> 128
  bq2       ball query r=0.4 K=64 over 512, 128 queries
  g2f       index_points [32,512,128] by [32,128,64]  (134 MB out)
  g1_bwd    grad of g1.sum() wrt features [32,1024,64]
  g2f_bwd   grad of g2f.sum() wrt features [32,512,128]

Run: timeout 1800 python experiments/profile_geom.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/profile_geom.log", "a", buffering=1)


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

    from papc_tpu.ops import index_points, query_ball_point
    from papc_tpu.ops.sampling import farthest_point_sample
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    B, N = 32, 1024
    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    feat1024 = jnp.asarray(rs.randn(B, N, 64).astype(np.float32))
    feat512 = jnp.asarray(rs.randn(B, 512, 128).astype(np.float32))

    # fixed realistic index sets (computed once, outside timing)
    idx1 = farthest_point_sample(xyz, 512)
    nx1 = index_points(xyz, idx1)
    bidx1 = query_ball_point(0.2, 32, xyz, nx1)
    idx2 = farthest_point_sample(nx1, 128)
    nx2 = index_points(nx1, idx2)
    bidx2 = query_ball_point(0.4, 64, nx1, nx2)
    for a in (idx1, nx1, bidx1, idx2, nx2, bidx2):
        np.asarray(a)

    KS = (8, 32)

    def scan_prog(body, init_builder):
        out = {}
        for k in KS:
            def run(carry, _k=k, _body=body):
                def step(c, i):
                    return _body(c, i), ()
                c, _ = lax.scan(step, carry, jnp.arange(_k))
                return c
            out[k] = (
                jax.jit(run, donate_argnums=(0,)),
                init_builder,
            )
        return out

    eps = jnp.float32(1e-12)

    PROGS = {
        "fps1": scan_prog(
            lambda c, i: c
            + farthest_point_sample(xyz + eps * c, 512).sum().astype(
                jnp.float32
            ),
            lambda: jnp.zeros(()),
        ),
        "bq1": scan_prog(
            lambda c, i: c
            + query_ball_point(0.2, 32, xyz + eps * c, nx1)
            .sum()
            .astype(jnp.float32),
            lambda: jnp.zeros(()),
        ),
        "g1": scan_prog(
            lambda c, i: c + index_points(xyz + eps * c, bidx1).sum(),
            lambda: jnp.zeros(()),
        ),
        "fps2": scan_prog(
            lambda c, i: c
            + farthest_point_sample(nx1 + eps * c, 128).sum().astype(
                jnp.float32
            ),
            lambda: jnp.zeros(()),
        ),
        "bq2": scan_prog(
            lambda c, i: c
            + query_ball_point(0.4, 64, nx1 + eps * c, nx2)
            .sum()
            .astype(jnp.float32),
            lambda: jnp.zeros(()),
        ),
        "g2f": scan_prog(
            lambda c, i: c + index_points(feat512 + eps * c, bidx2).sum(),
            lambda: jnp.zeros(()),
        ),
        "g1f_bwd": scan_prog(
            lambda c, i: c
            - eps
            * jax.grad(lambda f: index_points(f, bidx1).sum())(
                feat1024 + eps * c
            ).sum(),
            lambda: jnp.zeros(()),
        ),
        "g2f_bwd": scan_prog(
            lambda c, i: c
            - eps
            * jax.grad(lambda f: index_points(f, bidx2).sum())(
                feat512 + eps * c
            ).sum(),
            lambda: jnp.zeros(()),
        ),
    }

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
        t8, t32 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t32 - t8) / (KS[1] - KS[0])
        bound = t32 / KS[1]
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
