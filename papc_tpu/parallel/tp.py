"""Tensor-parallel parameter sharding over the 'model' mesh axis.

The zoo's FLOPs concentrate in wide Dense layers (e.g. the 128→1024
shared-MLP stage, the 1024→512 head, PointNet++ SA mlps). Sharding those
kernels column-wise over a 'model' axis splits the matmul across chips;
XLA inserts the activation collectives. This is applied as a
post-init device_put of the parameter tree — no model-code changes —
which keeps the whole zoo TP-capable with one rule set.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: tuple, leaf, n_model: int, min_dim: int = 256):
    """Sharding rule: column-shard wide Dense kernels; replicate the rest.

    A kernel ``[in, out]`` with ``out % n_model == 0`` and ``out >=
    min_dim`` gets ``P(None, 'model')``; its bias gets ``P('model')``
    only when the matching kernel is sharded (bias add follows the
    column split).
    """
    if n_model <= 1:
        return P()
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = np.shape(leaf)
    if (
        name == "kernel"
        and len(shape) == 2
        and shape[1] >= min_dim
        and shape[1] % n_model == 0
    ):
        return P(None, "model")
    if (
        name == "bias"
        and len(shape) == 1
        and shape[0] >= min_dim
        and shape[0] % n_model == 0
    ):
        return P("model")
    return P()


def shard_params(mesh: Mesh, params, min_dim: int = 256):
    """Apply the TP rule set to a parameter pytree (device_put)."""
    n_model = mesh.shape.get("model", 1)

    def put(path, leaf):
        spec = param_spec(path, leaf, n_model, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
