"""Can space-to-depth fix the stride-2 conv pathology (cs 2.08 vs cp 0.655)?

profile_conv64 r4: the RPN block1 stride-2 3x3 conv 64->64 on
[2, 496, 432, 64] costs 2.08 ms fwd+bwd (f32) vs 0.655 ms for an
equal-FLOP stride-1 conv; channel-padding to 128 made it WORSE, so the
pathology is the strided backward (input-grad = dilated conv), not the
half-empty lanes.

Rewrite: out = conv2x2_VALID(s2d(pad(x)), K') where s2d packs 2x2
pixel patches into channels ([B, 249, 217, 256]) and
K'[R, X, (py, px, c), o] = k[2R+py, 2X+px, c, o] (zero where the tap
falls outside the 3x3). Everything becomes stride-1 with >=128 input
channels; FLOPs go x16/9 (don't care, nowhere near MXU-bound).

Programs (fwd+bwd wrt kernel+input, scanned K=(4,16) slope, interleaved
best-of in ONE process):

  cs_*     stride-2 3x3 conv 64->64 on [2, 496, 432, 64]   (baseline)
  c2d_*    2x2 VALID conv 256->64 on the pre-s2d [2, 249, 217, 256]
           (the integration target: the BEV scatter writes the s2d
           canvas directly, so the transform is NOT in the hot path)
  c2dt_*   c2d including the s2d transform of a [2, 496, 432, 64]
           input each step (upper bound if the canvas stays classic)

Run: timeout 3000 python experiments/ab_s2d_conv.py [prefix ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/ab_s2d_conv.log", "a", buffering=1)


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
    B, H, W, C = 2, 496, 432, 64

    def s2d(x):
        # [B, H, W, C] -> [B, H//2+1, W//2+1, 4C]; patch r covers input
        # rows 2r-1, 2r (the stride-2 conv's pad=1 absorbed into s2d)
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xp = xp.reshape(b, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
        xp = xp.transpose(0, 1, 3, 2, 4, 5)
        return xp.reshape(b, (h + 2) // 2, (w + 2) // 2, 4 * c)

    def expand_kernel(k):
        # [3, 3, C, O] -> [2, 2, 4C, O] (zero-fill the dy=3 / dx=3 taps)
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [4, 4, C, O]
        c, o = k.shape[2], k.shape[3]
        kp = kp.reshape(2, 2, 2, 2, c, o)  # [R, py, X, px, C, O]
        kp = kp.transpose(0, 2, 1, 3, 4, 5)  # [R, X, py, px, C, O]
        return kp.reshape(2, 2, 4 * c, o)

    def conv(x, k, stride, padding):
        return lax.conv_general_dilated(
            x, k, (stride, stride), padding, dimension_numbers=DN
        )

    # ---- parity (HIGHEST precision, same chip, same input) -----------
    x32 = rs.randn(B, H, W, C).astype(np.float32)
    k32 = (rs.randn(3, 3, C, C) * 0.05).astype(np.float32)
    xj, kj = jnp.asarray(x32), jnp.asarray(k32)
    ref = jax.jit(
        lambda x, k: lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=DN,
            precision=lax.Precision.HIGHEST,
        )
    )(xj, kj)
    new = jax.jit(
        lambda x, k: lax.conv_general_dilated(
            s2d(x), expand_kernel(k), (1, 1), "VALID",
            dimension_numbers=DN, precision=lax.Precision.HIGHEST,
        )
    )(xj, kj)
    err = float(jnp.max(jnp.abs(ref - new)))
    scale = float(jnp.max(jnp.abs(ref)))
    log(f"parity s2d-vs-stride2: shapes {ref.shape} vs {new.shape}, "
        f"max|err|={err:.3e} (scale {scale:.2f})")
    assert ref.shape == new.shape
    assert err < 1e-3 * scale, err

    # ---- timed programs ----------------------------------------------
    x2d32 = np.asarray(jax.jit(s2d, backend="cpu")(x32))
    k2d32 = np.asarray(jax.jit(expand_kernel, backend="cpu")(k32))

    PROGS = {}

    def add(name, x_np, k_np, fwd):
        for prec, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x0 = jnp.asarray(x_np).astype(cast)
            k0 = jnp.asarray(k_np).astype(cast)

            def body(carry, i, _cast=cast, _fwd=fwd):
                k, x = carry

                def loss(k, x):
                    return _fwd(x, k).astype(jnp.float32).mean()

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

    add("cs", x32, k32, lambda x, k: conv(x, k, 2, ((1, 1), (1, 1))))
    add("c2d", x2d32, k2d32, lambda x, k: conv(x, k, 1, "VALID"))
    add(
        "c2dt", x32, k32,
        lambda x, k: conv(s2d(x), expand_kernel(k), 1, "VALID"),
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
