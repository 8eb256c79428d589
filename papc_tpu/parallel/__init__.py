"""papc_tpu.parallel — device meshes and sharding.

Axes implemented (the reference has NO parallelism — SURVEY §2.3):

- **DP** (`data` mesh axis): batches shard over devices in both
  trainers; XLA inserts the gradient ``psum`` over ICI (``mesh.py``).
- **TP** (`model` mesh axis): wide Dense kernels column-shard via the
  rule set in ``tp.py``; exercised by ``__graft_entry__.dryrun_multichip``.
- **SP** (point-axis sharding, the sequence/context-parallel analog):
  ``sp.py`` shards the N-points axis for huge clouds — sharded ball
  query and FPS with exact single-device semantics.
- **Multi-host DP**: ``distributed.py`` wraps ``jax.distributed``
  initialization; meshes span all processes' devices.

Deliberately ABSENT: **PP** (pipeline parallelism — the zoo's models are
a few tens of layers at tens of MB; a pipeline stage would be smaller
than one chip's step latency, so PP can only lose to DP here) and
**EP** (expert parallelism — no model in the point-cloud zoo has
mixture-of-experts routing).
"""

from papc_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)
from papc_tpu.parallel.sp import sharded_ball_query, sharded_fps
from papc_tpu.parallel.tp import param_spec, shard_params

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "shard_params",
    "param_spec",
    "sharded_ball_query",
    "sharded_fps",
]
