"""Multi-host initialization (DP over DCN).

The reference is single-device only. For papc-tpu, multi-host data
parallelism is the standard JAX recipe: call :func:`initialize` once per
process before any device use; after that ``jax.devices()`` spans the
whole slice/pod and the existing mesh helpers produce global meshes —
in-slice gradient reductions ride ICI, cross-slice ride DCN, both
inserted by XLA from the same sharding annotations.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed (no-op if already initialized or when
    running single-process). On Cloud TPU the arguments are discovered
    from the environment when omitted."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This process's row-slice of a globally sharded batch."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
