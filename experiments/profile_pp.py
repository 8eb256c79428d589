"""Itemized PointPillars TRAIN-step budget (VERDICT r3 #2 follow-up).

The r4 interleaved A/B put the scanned step at 32.45 ms fp32 (classic
PFN) against a ~2 ms FLOP floor. This breaks the step into cumulative
jitted programs, timed interleaved in ONE process (fetch-forced
K-chain slope):

  pfn      PFN forward only (decorate -> Dense/BN/ReLU/max)
  scatter  pfn + batch-folded scatter to the BEV canvas
  fwd      full network forward (adds RPN + heads)
  loss     fwd + compute_loss (targets/focal/smooth-L1)
  grad     value_and_grad of loss (fwd + bwd)
  step     the shipped train step (adds Adam + running metrics)

Differences between consecutive rows isolate each stage; (grad - loss)
is the backward cost. Progress logs to experiments/profile_pp.log.

Run: timeout 2400 python experiments/profile_pp.py [fp32|bf16]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open("experiments/profile_pp.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from papc_tpu.detect.detector import compute_loss
    from papc_tpu.detect.model import PillarFeatureNet, PointPillarsScatter
    from papc_tpu.detect.train import make_detection_train_step
    from papc_tpu.train.precision import cast_floating
    from papc_tpu.utils.timing import fetch_forced_time

    bf16 = precision == "bf16"
    log(f"devices: {jax.devices()} precision={precision}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    loss_cfg = fx["loss_cfg"]

    pfn_mod = PillarFeatureNet(
        num_filters=tuple(model.pfn_num_filters),
        voxel_size=tuple(model.voxel_size),
        pc_range=tuple(model.pc_range),
        with_distance=model.with_distance,
        use_norm=model.use_norm,
    )
    scatter_mod = PointPillarsScatter(model.ny, model.nx)

    def prep(params, voxels):
        if bf16:
            return (cast_floating(params, jnp.bfloat16),
                    voxels.astype(jnp.bfloat16))
        return params, voxels

    @jax.jit
    def stage_pfn(state, b):
        params, voxels = prep(state.params, b["voxels"])
        feats, _ = pfn_mod.apply(
            {"params": params["pfn"],
             "batch_stats": state.batch_stats["pfn"]},
            voxels, b["num_points"], b["coordinates"], train=True,
            mutable=["batch_stats"],
        )
        return feats

    @jax.jit
    def stage_scatter(state, b):
        params, voxels = prep(state.params, b["voxels"])
        feats, _ = pfn_mod.apply(
            {"params": params["pfn"],
             "batch_stats": state.batch_stats["pfn"]},
            voxels, b["num_points"], b["coordinates"], train=True,
            mutable=["batch_stats"],
        )
        return scatter_mod.apply({}, feats, b["coordinates"])

    @jax.jit
    def stage_fwd(state, b):
        params, voxels = prep(state.params, b["voxels"])
        preds, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            voxels, b["num_points"], b["coordinates"], train=True,
            mutable=["batch_stats"],
        )
        return preds["cls_preds"]

    def loss_only(params, state, b):
        params2, voxels = prep(params, b["voxels"])
        preds, _ = model.apply(
            {"params": params2, "batch_stats": state.batch_stats},
            voxels, b["num_points"], b["coordinates"], train=True,
            mutable=["batch_stats"],
        )
        if bf16:
            preds = cast_floating(preds, jnp.float32)
        loss, _ = compute_loss(
            preds, b["labels"], b["reg_targets"], b["anchors"], loss_cfg
        )
        return loss

    @jax.jit
    def stage_loss(state, b):
        return loss_only(state.params, state, b)

    @jax.jit
    def stage_grad(state, b):
        # grads are jit OUTPUTS (not DCE-able); one program, so forcing
        # the loss waits on the whole backward
        return jax.value_and_grad(loss_only)(state.params, state, b)

    train_step, init_rm = make_detection_train_step(
        model, loss_cfg, precision=precision
    )
    holder = {"s": jax.tree_util.tree_map(jnp.copy, state),
              "rm": init_rm()}

    def run_step():
        holder["s"], metrics, holder["rm"] = train_step(
            holder["s"], batch, holder["rm"]
        )
        return metrics["loss"]

    STAGES = {
        "pfn": lambda: stage_pfn(state, batch),
        "scatter": lambda: stage_scatter(state, batch),
        "fwd": lambda: stage_fwd(state, batch),
        "loss": lambda: stage_loss(state, batch),
        "grad": lambda: stage_grad(state, batch)[0],
        "step": run_step,
    }

    for name, fn in STAGES.items():
        log(f"compile {name} ...")
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    best = {name: float("inf") for name in STAGES}
    ROUNDS = 4
    for r in range(ROUNDS):
        for name, fn in STAGES.items():
            res = fetch_forced_time(fn, k_small=3, k_large=10, repeats=3)
            ms = res.step_s * 1e3
            best[name] = min(best[name], ms)
            log(f"round {r} {name}: {ms:.3f} ms")

    out = {"precision": precision}
    prev = 0.0
    for name in STAGES:
        out[name] = {"ms": best[name], "delta_ms": best[name] - prev}
        log(f"RESULT {name}: {best[name]:.3f} ms (+{best[name]-prev:.3f})")
        prev = best[name]
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
