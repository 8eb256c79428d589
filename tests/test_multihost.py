"""Multi-host smoke: 2-process jax.distributed over the CPU backend.

Exercises papc_tpu.parallel.distributed (initialize + local_batch_slice)
plus a cross-process psum over a global mesh — the DP-over-DCN recipe
(SURVEY §2.3) at its smallest real scale. Runs as two spawned python
processes against a localhost coordinator; skipped cleanly when this
jax build lacks CPU cross-process collectives.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
from papc_tpu.parallel.distributed import (
    initialize, is_main_process, local_batch_slice,
)

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert is_main_process() == (pid == 0)
# 2 processes x 2 local devices = 4 global devices
assert len(jax.devices()) == 4, len(jax.devices())

sl = local_batch_slice(8)
assert sl == slice(pid * 4, pid * 4 + 4), sl

# cross-process collective: psum over the global mesh
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import jax.numpy as jnp

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
local = jnp.full((2, 3), float(pid + 1))  # proc0: 1s, proc1: 2s

garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (4, 3)
)

@jax.jit
def total(x):
    return jnp.sum(x)

# sum over the global [4, 3] array: 2*3*1 + 2*3*2 = 18
out = float(total(garr))
assert out == 18.0, out

# collective-aware eval reduction: weighted mean across processes
from papc_tpu.parallel.distributed import all_mean
# proc0 reports 1.0 over 3 batches, proc1 reports 4.0 over 1 batch
m = all_mean(1.0 if pid == 0 else 4.0, weight=3.0 if pid == 0 else 1.0)
assert abs(m - (3 * 1.0 + 1 * 4.0) / 4) < 1e-9, m
print(f"proc{pid} ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_smoke(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers hung:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "distributed" in out and "not supported" in out.lower()
        ):
            pytest.skip(f"jax CPU cross-process unsupported: {out[-400:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-2000:]}"
        assert f"proc{pid} ok" in out
