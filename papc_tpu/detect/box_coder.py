"""Box coders (reference ``core/box_coders.py:31-96``).

One class per coder; ``encode``/``decode`` operate on numpy (host target
assignment) and ``decode_jnp`` provides the device twin used in the
prediction path (the reference's ``*Paddle`` subclasses)."""

from __future__ import annotations

import numpy as np

from papc_tpu.detect import box_np


class GroundBox3dCoder:
    """7-dof SECOND encoding; code_size 7 (or 8 with angle-vector)."""

    def __init__(self, linear_dim=False, vec_encode=False):
        self.linear_dim = linear_dim
        self.vec_encode = vec_encode

    @property
    def code_size(self) -> int:
        return 8 if self.vec_encode else 7

    def encode(self, boxes, anchors):
        return box_np.second_box_encode(
            boxes, anchors, self.vec_encode, self.linear_dim
        )

    def decode(self, encodings, anchors):
        return box_np.second_box_decode(
            encodings, anchors, self.vec_encode, self.linear_dim
        )

    def decode_jnp(self, encodings, anchors):
        import jax.numpy as jnp

        xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
        if self.vec_encode:
            xt, yt, zt, wt, lt, ht, rtx, rty = jnp.split(
                encodings, 8, axis=-1
            )
        else:
            xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings, 7, axis=-1)
        za = za + ha / 2
        diagonal = jnp.sqrt(la**2 + wa**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * ha + za
        if self.linear_dim:
            lg, wg, hg = (lt + 1) * la, (wt + 1) * wa, (ht + 1) * ha
        else:
            lg = jnp.exp(lt) * la
            wg = jnp.exp(wt) * wa
            hg = jnp.exp(ht) * ha
        if self.vec_encode:
            rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
        else:
            rg = rt + ra
        zg = zg - hg / 2
        return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


class BevBoxCoder:
    """5-dof BEV encoding with fixed z/h (reference :48-73)."""

    def __init__(self, linear_dim=False, vec_encode=False, z_fixed=-1.0,
                 h_fixed=2.0):
        self.linear_dim = linear_dim
        self.vec_encode = vec_encode
        self.z_fixed = z_fixed
        self.h_fixed = h_fixed

    @property
    def code_size(self) -> int:
        return 6 if self.vec_encode else 5

    def encode(self, boxes, anchors):
        anchors = anchors[..., [0, 1, 3, 4, 6]]
        boxes = boxes[..., [0, 1, 3, 4, 6]]
        return box_np.bev_box_encode(
            boxes, anchors, self.vec_encode, self.linear_dim
        )

    def decode(self, encodings, anchors):
        anchors = anchors[..., [0, 1, 3, 4, 6]]
        ret = box_np.bev_box_decode(
            encodings, anchors, self.vec_encode, self.linear_dim
        )
        z_fixed = np.full([*ret.shape[:-1], 1], self.z_fixed, ret.dtype)
        h_fixed = np.full([*ret.shape[:-1], 1], self.h_fixed, ret.dtype)
        return np.concatenate(
            [ret[..., :2], z_fixed, ret[..., 2:4], h_fixed, ret[..., 4:]],
            axis=-1,
        )

    def decode_jnp(self, encodings, anchors):
        import jax.numpy as jnp

        anchors5 = anchors[..., jnp.asarray([0, 1, 3, 4, 6])]
        xa, ya, wa, la, ra = jnp.split(anchors5, 5, axis=-1)
        if self.vec_encode:
            xt, yt, wt, lt, rtx, rty = jnp.split(encodings, 6, axis=-1)
        else:
            xt, yt, wt, lt, rt = jnp.split(encodings, 5, axis=-1)
        diagonal = jnp.sqrt(la**2 + wa**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        if self.linear_dim:
            lg, wg = (lt + 1) * la, (wt + 1) * wa
        else:
            lg, wg = jnp.exp(lt) * la, jnp.exp(wt) * wa
        if self.vec_encode:
            rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
        else:
            rg = rt + ra
        z = jnp.full_like(xg, self.z_fixed)
        h = jnp.full_like(xg, self.h_fixed)
        return jnp.concatenate([xg, yg, z, wg, lg, h, rg], axis=-1)
