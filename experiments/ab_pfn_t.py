"""Classic PFN vs transposed BN-folded PFN (detect/pfn_fast.py) on chip.

profile_ppb r4: classic PFN fwd+bwd = 5.354 ms of the 32.6 ms step.
Theory: the classic [B, V, P, D] layout lane-pads D=9 -> 128 (14x HBM)
on every touch of the 2.4M-slot tensor, and train-mode BN re-reads the
[B, V, P, 64] pre-activation for stats. pfn_forward_t fixes the layout
([B, D, V, P], P on lanes), derives BN stats from the 10x10 feature
covariance (h never materialized for stats), folds BN into the Dense,
and checkpoints the final pass.

Programs (fwd+bwd wrt PFN params, scanned K=(4,16) slope, interleaved
best-of in ONE process; production shape [2, 12000, 100, 9/4]):

  pfnc_*   classic PillarFeatureNet.apply (baseline, re-measured here)
  pfnt_*   pfn_forward_t on the pre-transposed [B, D, V, P] input

Run: timeout 3000 python experiments/ab_pfn_t.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_pfn_t.log", "a", buffering=1)


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
    from papc_tpu.detect.model import PillarFeatureNet
    from papc_tpu.detect.pfn_fast import pfn_forward_t
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    KS = (4, 16)

    pfn_mod = PillarFeatureNet(
        num_filters=tuple(model.pfn_num_filters),
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
        use_norm=model.use_norm,
    )
    pfn_params = state.params["pfn"]
    pfn_stats = state.batch_stats["pfn"]
    voxels = batch["voxels"]
    voxels_t = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(voxels).transpose(0, 3, 1, 2)
        )
    )
    num_points, coords = batch["num_points"], batch["coordinates"]
    kw = dict(
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
    )

    # ---- on-chip parity ----------------------------------------------
    p0 = pfn_params["PFNLayer_0"]
    s0 = pfn_stats["PFNLayer_0"]["BatchNorm_0"]
    triple0 = (
        p0["Dense_0"]["kernel"],
        p0["BatchNorm_0"]["scale"],
        p0["BatchNorm_0"]["bias"],
    )
    running0 = (s0["mean"], s0["var"])

    classic, _ = jax.jit(
        lambda: pfn_mod.apply(
            {"params": pfn_params, "batch_stats": pfn_stats},
            voxels, num_points, coords, train=True,
            mutable=["batch_stats"],
        )
    )()
    fast, _ = jax.jit(
        lambda: pfn_forward_t(
            *triple0, running0, voxels_t, num_points, coords,
            train=True, **kw,
        )
    )()
    err = float(jnp.max(jnp.abs(classic - fast)))
    scale = float(jnp.max(jnp.abs(classic)))
    log(f"parity classic-vs-t: max|err|={err:.3e} (scale {scale:.2f})")
    assert err < 3e-2 * max(scale, 1.0), err

    # ---- timed programs ----------------------------------------------
    PROGS = {}

    def add(name, body_of, init):
        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            body = body_of(cast)
            progs = {}
            for k in KS:
                def run(carry, _k=k, _body=body):
                    def step(c, i):
                        return _body(c, i), ()

                    c, _ = lax.scan(step, carry, jnp.arange(_k))
                    return c

                progs[k] = (jax.jit(run, donate_argnums=(0,)), init)
            PROGS[f"{name}_{prec}"] = progs

    def classic_body(cast):
        vox = voxels.astype(cast)

        def body(carry, i):
            params = carry

            def loss(p):
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(cast)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    p,
                )
                feats, _ = pfn_mod.apply(
                    {"params": p, "batch_stats": pfn_stats},
                    vox, num_points, coords, train=True,
                    mutable=["batch_stats"],
                )
                return feats.astype(jnp.float32).sum()

            g = jax.grad(loss)(params)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), params, g
            )

        return body

    def fast_body(cast):
        vox_t = voxels_t.astype(cast)

        def body(carry, i):
            triple = carry

            def loss(tr):
                k, s, b = (a.astype(cast) for a in tr)
                out, _ = pfn_forward_t(
                    k, s, b, running0, vox_t, num_points, coords,
                    train=True, **kw,
                )
                return out.astype(jnp.float32).sum()

            g = jax.grad(loss)(triple)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), triple, g
            )

        return body

    add(
        "pfnc", classic_body,
        lambda: jax.tree_util.tree_map(jnp.copy, pfn_params),
    )
    add(
        "pfnt", fast_body,
        lambda: jax.tree_util.tree_map(jnp.copy, triple0),
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
