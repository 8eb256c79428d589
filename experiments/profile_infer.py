"""Itemized PointPillars INFERENCE budget (VERDICT r3 #3).

BENCH_r03 recorded 6.8 ms/frame end-to-end predict. This breaks the
jitted predict into cumulative stages, each its own jitted program,
timed interleaved in ONE process (fetch-forced K-chain slope):

  fwd        network forward only (PFN -> scatter -> RPN heads)
  decode     fwd + box decode + score transform (decode_raw)
  topk       decode + score threshold + per-sample top-k(1000)
  full       the shipped predict_step (adds rotated NMS + compaction
             + direction flip)

Differences between consecutive rows isolate each stage's cost.
Progress logs to experiments/profile_infer.log.

Run: timeout 1800 python experiments/profile_infer.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open("experiments/profile_infer.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from papc_tpu.detect import builders
    from papc_tpu.detect.detector import decode_raw, predict
    from papc_tpu.detect.train import make_predict_step
    from papc_tpu.utils.timing import fetch_forced_time

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    cfg, ta, coder, Bd = fx["cfg"], fx["ta"], fx["coder"], fx["Bd"]
    predict_cfg = builders.build_predict_config(cfg, ta)
    infer_batch = {
        k: batch[k]
        for k in (
            "voxels", "num_points", "coordinates", "anchors",
            "points_flat", "point_pillar",
        )
        if k in batch
    }

    def apply_fwd(state, b):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b.get("voxels"), b["num_points"], b["coordinates"],
            train=False,
            points=b.get("points_flat"),
            point_pillar=b.get("point_pillar"),
        )

    @jax.jit
    def stage_fwd(state, b):
        preds = apply_fwd(state, b)
        return preds["cls_preds"]

    @jax.jit
    def stage_decode(state, b):
        preds = apply_fwd(state, b)
        boxes, scores, dirs = decode_raw(
            preds, b["anchors"], coder.decode_jnp, predict_cfg
        )
        return boxes, scores

    @jax.jit
    def stage_topk(state, b):
        preds = apply_fwd(state, b)
        boxes, total_scores, dirs = decode_raw(
            preds, b["anchors"], coder.decode_jnp, predict_cfg
        )
        top_scores = jnp.max(total_scores, axis=-1)
        K = min(predict_cfg.nms_pre_max_size, boxes.shape[1])

        def per_sample(boxes_i, scores_i):
            top_s, top_idx = jax.lax.top_k(scores_i, K)
            return boxes_i[top_idx], top_s

        return jax.vmap(per_sample)(boxes, top_scores)

    full_step = make_predict_step(model, predict_cfg, coder)
    full_bf16 = make_predict_step(
        model, predict_cfg, coder, precision="bf16"
    )

    STAGES = {
        "fwd": lambda: stage_fwd(state, infer_batch),
        "decode": lambda: stage_decode(state, infer_batch)[1],
        "topk": lambda: stage_topk(state, infer_batch)[1],
        "full": lambda: full_step(state, infer_batch)["scores"],
        "full_bf16": lambda: full_bf16(state, infer_batch)["scores"],
    }

    # compile everything up front, one risky program at a time
    for name, fn in STAGES.items():
        log(f"compile {name} ...")
        t0 = time.perf_counter()
        import numpy as np

        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        log(f"  compiled+ran in {time.perf_counter() - t0:.1f}s")

    best = {name: float("inf") for name in STAGES}
    ROUNDS = 4
    for r in range(ROUNDS):
        for name, fn in STAGES.items():
            res = fetch_forced_time(fn, k_small=3, k_large=10, repeats=3)
            ms = res.step_s * 1e3
            best[name] = min(best[name], ms)
            log(f"round {r} {name}: {ms:.3f} ms/call")

    out = {}
    prev = 0.0
    for name in ("fwd", "decode", "topk", "full", "full_bf16"):
        if name not in best:
            continue
        per_frame = best[name] / Bd
        out[name] = {
            "ms_per_call": best[name],
            "ms_per_frame": per_frame,
            "stage_delta_ms_per_frame": per_frame - prev,
        }
        log(
            f"RESULT {name}: {best[name]:.3f} ms/call "
            f"{per_frame:.3f} ms/frame (+{per_frame - prev:.3f})"
        )
        prev = per_frame
    print(json.dumps(out))
    LOG.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    sys.exit(main())
