"""papc_tpu.ops — functional kernel library (pure jnp reference impls +
Pallas TPU kernels behind one API). All static-shape, all batched, fully
on-device."""

from papc_tpu.ops.geometry import index_points, pc_normalize, square_distance
from papc_tpu.ops.grouping import (
    knn,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
)
from papc_tpu.ops.interpolate import three_nn_interpolate
from papc_tpu.ops.sampling import farthest_point_sample

__all__ = [
    "square_distance",
    "index_points",
    "pc_normalize",
    "farthest_point_sample",
    "query_ball_point",
    "knn",
    "sample_and_group",
    "sample_and_group_all",
    "three_nn_interpolate",
]
