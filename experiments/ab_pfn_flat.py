"""Classic padded-slot PFN vs flat-points PFN (pfn_forward_flat) on chip.

The classic PFN costs 5.35 ms fwd+bwd f32 (profile_ppb r4) because it
computes on the full [2, 12000, 100, D] slot grid (2.4M slots) with the
D=9 decorated axis lane-padded to 128. The flat path computes on the
N real points (static cap 25600/sample here, ~60x fewer slots at real
KITTI occupancy) with the per-pillar max as ONE flat segment scatter-max.

Occupancy note: classic cost is SHAPE-bound (independent of
num_points); flat cost is CAP-bound (independent too). So one batch
with small counts serves both parity and representative timing.

Programs (fwd+bwd wrt PFN params, scanned K=(4,16) slope, interleaved
best-of in ONE process):

  pfnc_*     classic PillarFeatureNet.apply  [2, 12000, 100, 4]
  pfnflat_*  pfn_forward_flat                [2, 25600, 4] + segment max

Run: timeout 3000 python experiments/ab_pfn_flat.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_pfn_flat.log", "a", buffering=1)


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
    from papc_tpu.detect.pfn_fast import (
        flatten_pillars,
        pfn_forward_flat,
    )
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state = fx["model"], fx["state"]
    KS = (4, 16)
    N_CAP = 25600

    # realistic-occupancy batch: V=12000 pillars, 1-2 points each
    # (sum <= 24000 < N_CAP so flat == classic exactly)
    rs = np.random.RandomState(0)
    Bd, V, P, D = 2, 12000, 100, 4
    num_points = rs.randint(1, 3, size=(Bd, V)).astype(np.int32)
    voxels = rs.randn(Bd, V, P, D).astype(np.float32)
    slot = np.arange(P)[None, None, :]
    voxels *= (slot < num_points[..., None])[..., None]
    coords = np.asarray(fx["batch"]["coordinates"])
    points, owner = flatten_pillars(voxels, num_points, coords, N_CAP)

    voxels_j = jnp.asarray(voxels)
    np_j = jnp.asarray(num_points)
    coords_j = jnp.asarray(coords)
    points_j = jnp.asarray(points)
    owner_j = jnp.asarray(owner)

    pfn_mod = PillarFeatureNet(
        num_filters=tuple(model.pfn_num_filters),
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
        use_norm=model.use_norm,
    )
    pfn_params = state.params["pfn"]
    pfn_stats = state.batch_stats["pfn"]
    p0 = pfn_params["PFNLayer_0"]
    s0 = pfn_stats["PFNLayer_0"]["BatchNorm_0"]
    triple0 = (
        p0["Dense_0"]["kernel"],
        p0["BatchNorm_0"]["scale"],
        p0["BatchNorm_0"]["bias"],
    )
    running0 = (s0["mean"], s0["var"])
    kw = dict(
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
    )

    # ---- on-chip parity ----------------------------------------------
    classic, _ = jax.jit(
        lambda: pfn_mod.apply(
            {"params": pfn_params, "batch_stats": pfn_stats},
            voxels_j, np_j, coords_j, train=True,
            mutable=["batch_stats"],
        )
    )()
    flat, _ = jax.jit(
        lambda: pfn_forward_flat(
            *triple0, running0, points_j, owner_j, np_j, coords_j, P,
            train=True, **kw,
        )
    )()
    err = float(jnp.max(jnp.abs(classic - flat)))
    scale = float(jnp.max(jnp.abs(classic)))
    log(f"parity classic-vs-flat: max|err|={err:.3e} (scale {scale:.2f})")
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
        vox = voxels_j.astype(cast)

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
                    vox, np_j, coords_j, train=True,
                    mutable=["batch_stats"],
                )
                return feats.astype(jnp.float32).sum()

            g = jax.grad(loss)(params)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), params, g
            )

        return body

    def flat_body(cast):
        pts = points_j.astype(cast)

        def body(carry, i):
            triple = carry

            def loss(tr):
                k, s, b = (a.astype(cast) for a in tr)
                out, _ = pfn_forward_flat(
                    k, s, b, running0, pts, owner_j, np_j, coords_j, P,
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
        "pfnflat", flat_body,
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
