"""XLA cost analysis of the compiled PointPillars train step.

Where do the ~28.6 ms go? bytes-accessed vs the 819 GB/s HBM roofline
and FLOPs vs the 197 TF/s MXU roofline tell whether the step is
HBM-bound (hunt bytes) or latency/serialization-bound (hunt the op).
Also dumps the top fusions by output size from the optimized HLO.

Run: timeout 1200 python experiments/cost_analysis_step.py
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("experiments/cost_analysis_step.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    from papc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    import bench
    from papc_tpu.detect.train import make_detection_train_step

    log(f"devices: {jax.devices()}")
    fx = bench._pointpillars_fixture()
    model, state, batch = fx["model"], fx["state"], fx["batch"]
    loss_cfg = fx["loss_cfg"]
    log(f"model: scatter_s2d={model.scatter_s2d} pfn_flat={model.pfn_flat}")
    log(f"batch keys: {sorted(batch)}")

    prec = os.environ.get("CA_PRECISION", "fp32")
    log(f"precision: {prec}")
    step, init_rm = make_detection_train_step(
        model, loss_cfg, precision=prec
    )
    lowered = jax.jit(step.impl, donate_argnums=(0,)).lower(
        state, batch, init_rm()
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    log(f"flops={flops:.3e}  bytes accessed={bytes_acc:.3e}")
    log(f"  HBM roofline  @819 GB/s: {bytes_acc/819e9*1e3:.2f} ms")
    log(f"  MXU roofline  @197 TF/s (f32 ~98): {flops/98e12*1e3:.2f} ms")
    for k, v in sorted(ca.items()):
        if isinstance(v, float) and v > 1e6:
            log(f"  {k}: {v:.3e}")

    txt = compiled.as_text()
    log(f"optimized HLO: {len(txt.splitlines())} lines")
    # top ops by total operand+result size
    sizes = []
    for m_line in txt.splitlines():
        m_line = m_line.strip()
        m = re.match(r"(%?[\w\.\-]+) = (\w+\[[\d,]*\])", m_line)
        if not m:
            continue
        name, shp = m.groups()
        dims = re.findall(r"\[([\d,]*)\]", shp)
        if not dims or not dims[0]:
            continue
        n = int(np.prod([int(d) for d in dims[0].split(",")]))
        dtype = shp.split("[")[0]
        bpe = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s8": 1, "u8": 1}.get(dtype, 4)
        op = m_line.split("=", 1)[1].strip()
        kind = op.split("(")[0].split()[-1] if "(" in op else op[:40]
        sizes.append((n * bpe, name, kind, m_line[:180]))
    sizes.sort(reverse=True)
    log("top 25 result buffers:")
    for sz, name, kind, line in sizes[:25]:
        log(f"  {sz/1e6:8.1f} MB  {line[:150]}")

    # aggregate result bytes by op kind
    agg = {}
    for sz, name, kind, line in sizes:
        k = re.sub(r"\.\d+$", "", kind)
        agg[k] = agg.get(k, 0) + sz
    log("result bytes by op kind (top 15):")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        log(f"  {v/1e6:10.1f} MB  {k}")

    # pure layout copies (relayout traffic: read + write the buffer)
    copy_bytes = sum(
        sz for sz, name, kind, line in sizes
        if re.match(r"\s*%?[\w\.\-]+ = \S+ copy\(", line.strip())
        or " copy(" in line.split("=", 1)[1][:40]
    )
    log(f"pure copy result bytes: {copy_bytes/1e6:.1f} MB "
        f"(~{2*copy_bytes/819e9*1e3:.2f} ms of relayout traffic)")

    # attribute result bytes to module paths from metadata op_name
    mod = {}
    for m_line in txt.splitlines():
        m_line = m_line.strip()
        m = re.match(r"%?[\w\.\-]+ = (\w+)\[([\d,]*)\]", m_line)
        if not m or not m.group(2):
            continue
        dtype, dims = m.groups()
        n = int(np.prod([int(d) for d in dims.split(",")]))
        bpe = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}.get(
            dtype, 4
        )
        mm = re.search(r'op_name="jit\(step_impl\)/([^"]+)"', m_line)
        if not mm:
            continue
        path = mm.group(1)
        path = re.sub(r"^transpose\(jvp\((\w+)\)\)/", r"bwd:\1/", path)
        path = re.sub(r"^jvp\((\w+)\)/", r"fwd:\1/", path)
        key = "/".join(path.split("/")[:3])
        mod[key] = mod.get(key, 0) + n * bpe
    log("result bytes by module path (top 25):")
    for k, v in sorted(mod.items(), key=lambda kv: -kv[1])[:25]:
        log(f"  {v/1e6:10.1f} MB  {k}")


if __name__ == "__main__":
    sys.exit(main())
