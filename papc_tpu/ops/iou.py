"""Device-side (jnp, jittable) box IoU — axis-aligned and exact rotated.

The rotated-IoU kernel mirrors the candidate-vertex construction of the
reference's numba-CUDA ``devRotateIoU`` suite
(``non_max_suppression/nms_gpu.py:179-414``): intersection vertices are
(a) corners of A inside B, (b) corners of B inside A, (c) the 16
edge-pair intersection points — ≤24 fixed candidate slots with validity
masks, sorted by angle about their centroid, shoelace area over the
masked ring. Everything is static-shape and vmappable; no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_2d(boxes: jax.Array, query: jax.Array, eps: float = 0.0) -> jax.Array:
    """Axis-aligned IoU matrix: [N, 4] x [K, 4] → [N, K]."""
    b = boxes[:, None, :]
    q = query[None, :, :]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + eps
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + eps
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    area_b = (b[..., 2] - b[..., 0] + eps) * (b[..., 3] - b[..., 1] + eps)
    area_q = (q[..., 2] - q[..., 0] + eps) * (q[..., 3] - q[..., 1] + eps)
    out = inter / (area_b + area_q - inter)
    return jnp.where((iw > 0) & (ih > 0), out, 0.0)


def box5_to_corners(boxes: jax.Array) -> jax.Array:
    """[..., 5] (x, y, w, l, yaw) → [..., 4, 2] corners (same winding as
    the host ``center_to_corner_box2d``)."""
    x, y, w, l, r = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(r), jnp.sin(r)
    # relative corners before rotation, clockwise from min
    rel = jnp.stack(
        [
            jnp.stack([-w / 2, -l / 2], -1),
            jnp.stack([-w / 2, l / 2], -1),
            jnp.stack([w / 2, l / 2], -1),
            jnp.stack([w / 2, -l / 2], -1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )  # [..., 2, 2] — row-vector p @ [[c,-s],[s,c]]
    rotated = jnp.einsum("...ki,...ij->...kj", rel, rot)
    return rotated + jnp.stack([x, y], -1)[..., None, :]


def _point_in_quad(pts: jax.Array, quad: jax.Array) -> jax.Array:
    """pts [..., P, 2] inside convex quad [..., 4, 2] (any winding)."""
    a = quad
    b = jnp.roll(quad, -1, axis=-2)
    edge = b - a  # [..., 4, 2]
    rel = pts[..., :, None, :] - a[..., None, :, :]  # [..., P, 4, 2]
    cross = (
        edge[..., None, :, 0] * rel[..., 1] - edge[..., None, :, 1] * rel[..., 0]
    )  # [..., P, 4]
    return jnp.all(cross >= 0, -1) | jnp.all(cross <= 0, -1)


def _segment_intersections(ca: jax.Array, cb: jax.Array):
    """All 16 edge-pair intersection points of two quads.

    ca, cb: [..., 4, 2]. Returns points [..., 16, 2], valid [..., 16].
    """
    p = ca  # segment starts A
    r = jnp.roll(ca, -1, axis=-2) - ca  # A edge vectors
    q = cb
    s = jnp.roll(cb, -1, axis=-2) - cb
    # broadcast pairs: i over A edges, j over B edges
    p_ = p[..., :, None, :]
    r_ = r[..., :, None, :]
    q_ = q[..., None, :, :]
    s_ = s[..., None, :, :]
    denom = r_[..., 0] * s_[..., 1] - r_[..., 1] * s_[..., 0]
    qp = q_ - p_
    t = (qp[..., 0] * s_[..., 1] - qp[..., 1] * s_[..., 0]) / jnp.where(
        denom == 0, 1.0, denom
    )
    u = (qp[..., 0] * r_[..., 1] - qp[..., 1] * r_[..., 0]) / jnp.where(
        denom == 0, 1.0, denom
    )
    valid = (
        (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    )
    pt = p_ + t[..., None] * r_
    shape = pt.shape[:-3] + (16, 2)
    return pt.reshape(shape), valid.reshape(shape[:-1])


def rotated_intersection_area(ca: jax.Array, cb: jax.Array) -> jax.Array:
    """Intersection area of two convex quads given corners [..., 4, 2]."""
    batch = jnp.broadcast_shapes(ca.shape[:-2], cb.shape[:-2])
    ca = jnp.broadcast_to(ca, batch + ca.shape[-2:])
    cb = jnp.broadcast_to(cb, batch + cb.shape[-2:])
    in_b = _point_in_quad(ca, cb)  # [..., 4]
    in_a = _point_in_quad(cb, ca)
    inter_pts, inter_valid = _segment_intersections(ca, cb)
    pts = jnp.concatenate([ca, cb, inter_pts], axis=-2)  # [..., 24, 2]
    valid = jnp.concatenate([in_b, in_a, inter_valid], axis=-1)

    n_valid = jnp.sum(valid, axis=-1, keepdims=True)
    centroid = jnp.sum(
        jnp.where(valid[..., None], pts, 0.0), axis=-2, keepdims=True
    ) / jnp.maximum(n_valid[..., None], 1)
    ang = jnp.arctan2(
        pts[..., 1] - centroid[..., 1], pts[..., 0] - centroid[..., 0]
    )
    ang = jnp.where(valid, ang, jnp.inf)  # invalid slots sort last
    order = jnp.argsort(ang, axis=-1)
    pts_sorted = jnp.take_along_axis(pts, order[..., None], axis=-2)
    valid_sorted = jnp.take_along_axis(valid, order, axis=-1)
    # fill invalid slots with the first vertex: duplicate points add zero
    # shoelace contribution, closing the ring correctly
    first = pts_sorted[..., :1, :]
    ring = jnp.where(valid_sorted[..., None], pts_sorted, first)
    nxt = jnp.roll(ring, -1, axis=-2)
    area2 = jnp.sum(
        ring[..., 0] * nxt[..., 1] - nxt[..., 0] * ring[..., 1], axis=-1
    )
    area = 0.5 * jnp.abs(area2)
    return jnp.where(n_valid[..., 0] >= 3, area, 0.0)


def rotate_iou(
    rbboxes: jax.Array, qrbboxes: jax.Array, criterion: int = -1
) -> jax.Array:
    """Exact rotated BEV IoU matrix [N, K] for [*, 5] (x, y, w, l, yaw).

    ``criterion``: -1 IoU, 0 inter/area_boxes, 1 inter/area_query,
    anything else raw intersection area — matching the reference eval
    kernel (``nms_gpu.py:618-653``).
    """
    ca = box5_to_corners(rbboxes)  # [N, 4, 2]
    cb = box5_to_corners(qrbboxes)  # [K, 4, 2]
    inter = rotated_intersection_area(
        ca[:, None, :, :], cb[None, :, :, :]
    )  # [N, K]
    area_a = (rbboxes[:, 2] * rbboxes[:, 3])[:, None]
    area_b = (qrbboxes[:, 2] * qrbboxes[:, 3])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = jnp.broadcast_to(area_a, inter.shape)
    elif criterion == 1:
        denom = jnp.broadcast_to(area_b, inter.shape)
    else:
        denom = jnp.ones_like(inter)
    return jnp.where(denom > 0, inter / denom, 0.0)
