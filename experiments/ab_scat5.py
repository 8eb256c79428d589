"""A/B the s2d BEV scatter forms (fwd+bwd, bf16 features).

profile_pp5 (r5) put the scat stage at +2.46 ms of the 15.66 ms bf16
PointPillars step — far above its ~0.3 ms traffic bound (canvas
[2, 249, 217, 256] bf16 = 55 MB, fwd write + bwd gather). Suspect: the
XLA lowering of the 24k-row ``.at[rows].set`` scatter. Arms (scanned
K=(4,16) slope, interleaved best-of in ONE process):

  cur    scatter_to_bev_s2d as deployed (indexed-set, default mode)
  uniq   same but ``mode="drop", unique_indices=True`` — rows are
         unique by construction (one pillar per cell; the dump row
         only ever receives 0.0, so duplicate order is immaterial)
  invg   inverse-index gather: scatter 24k i32 pillar ids (64× less
         scatter data), then build the canvas as ONE flat row gather

Run: timeout 4000 python experiments/ab_scat5.py [arm ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_scat5.log", "a", buffering=1)


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
    B, V, C = 2, 12000, 64
    ny, nx = 496, 432
    py, px = ny // 2 + 1, nx // 2 + 1
    cells = py * px * 4

    feats0 = jnp.asarray(
        rs.randn(B, V, C).astype(np.float32), jnp.bfloat16
    )
    # valid unique cells per sample (mirror of the fixture's coords)
    coords_np = np.stack(
        [
            np.zeros((B, V)),
            rs.randint(0, ny, (B, V)),
            rs.randint(0, nx, (B, V)),
        ],
        -1,
    ).astype(np.int32)
    coords = jnp.asarray(coords_np)

    valid = coords[:, :, 0] >= 0
    yp = coords[:, :, 1] + 1
    xp = coords[:, :, 2] + 1
    phase = (yp % 2) * 2 + (xp % 2)
    base = jnp.arange(B, dtype=jnp.int32)[:, None] * cells
    rows = jnp.where(
        valid,
        base + ((yp // 2) * px + xp // 2) * 4 + phase,
        B * cells,
    ).reshape(B * V)

    def scat_cur(features):
        canvas = jnp.zeros((B * cells + 1, C), features.dtype)
        canvas = canvas.at[rows].set(
            jnp.where(valid[..., None], features, 0.0).reshape(
                B * V, C
            )
        )
        return canvas[: B * cells].reshape(B, py, px, 4 * C)

    def scat_uniq(features):
        canvas = jnp.zeros((B * cells + 1, C), features.dtype)
        canvas = canvas.at[rows].set(
            jnp.where(valid[..., None], features, 0.0).reshape(
                B * V, C
            ),
            mode="drop",
            unique_indices=True,
        )
        return canvas[: B * cells].reshape(B, py, px, 4 * C)

    def scat_invg(features):
        inv = jnp.full((B * cells + 1,), B * V, jnp.int32)
        inv = inv.at[rows].set(
            jnp.arange(B * V, dtype=jnp.int32),
            mode="drop",
            unique_indices=True,
        )
        flat = jnp.concatenate(
            [
                jnp.where(valid[..., None], features, 0.0).reshape(
                    B * V, C
                ),
                jnp.zeros((1, C), features.dtype),
            ],
            0,
        )
        canvas = flat[inv[: B * cells]]
        return canvas.reshape(B, py, px, 4 * C)

    FNS = {"cur": scat_cur, "uniq": scat_uniq, "invg": scat_invg}
    arms = sys.argv[1:] or list(FNS)

    # parity check on device first (tiny cost)
    ref = np.asarray(scat_cur(feats0).astype(jnp.float32))
    for name in arms:
        got = np.asarray(FNS[name](feats0).astype(jnp.float32))
        ok = np.array_equal(ref, got)
        log(f"parity {name}: {'OK' if ok else 'MISMATCH'}")
        assert ok, name

    PROGS = {}
    for name in arms:
        f = FNS[name]

        def body(carry, i, _f=f):
            feats = carry

            def scalar(feats):
                c = _f(feats)
                cf = c.astype(jnp.float32)
                return (cf * cf).sum()

            g = jax.grad(scalar)(feats)
            return feats - jnp.bfloat16(1e-9) * g.astype(feats.dtype)

        progs = {}
        for k in KS:
            def run(carry, _k=k, _body=body):
                def stp(c, i):
                    return _body(c, i), ()

                c, _ = lax.scan(stp, carry, jnp.arange(_k))
                return c

            progs[k] = jax.jit(run, donate_argnums=(0,))
        PROGS[name] = progs

    compiled = {}
    for name, progs in PROGS.items():
        for k in KS:
            log(f"compile {name} K={k} ...")
            t0 = time.perf_counter()
            c = progs[k](jnp.copy(feats0))
            np.asarray(c[0, 0, 0])
            compiled[(name, k)] = progs[k]
            log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    def window(name, k):
        fn = compiled[(name, k)]
        h = {"c": jnp.copy(feats0)}

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
        t4, t16 = best[(name, KS[0])], best[(name, KS[1])]
        slope = (t16 - t4) / (KS[1] - KS[0])
        bound = t16 / KS[1]
        step_ms = (slope if slope > 0 else bound) * 1e3
        out[name] = {
            "step_ms": round(step_ms, 3),
            "method": "k-slope" if slope > 0 else "window-bound",
        }
        log(f"RESULT {name}: {step_ms:.3f} ms (fwd+bwd)")
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
