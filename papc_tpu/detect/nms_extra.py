"""Soft-NMS and multiclass NMS.

Reference parity: ``libs/ops/non_max_suppression/nms_cpu.py::soft_nms_jit``
(:79-169 — linear/gaussian score decay with the classic +1 pixel-area
convention) and ``libs/ops/box_paddle_ops.py::multiclass_nms`` (:345-392
— per-class NMS over a shared box set).
"""

from __future__ import annotations

import numpy as np


def soft_nms(
    boxes: np.ndarray,
    sigma: float = 0.5,
    Nt: float = 0.3,
    threshold: float = 0.001,
    method: int = 0,
):
    """Soft-NMS over ``[N, 5]`` (x1, y1, x2, y2, score) boxes.

    ``method``: 0 = hard NMS, 1 = linear decay, 2 = gaussian decay.
    Returns (kept_boxes ``[K, 5]``, keep_count) — the in-place
    max-selection/compaction algorithm of the reference, without
    mutating the caller's array.
    """
    boxes = np.array(boxes, dtype=np.float32, copy=True)
    N = len(boxes)
    i = 0
    while i < N:
        # move the max-score remaining box to position i
        maxpos = i + int(np.argmax(boxes[i:N, 4]))
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        tx1, ty1, tx2, ty2 = boxes[i, :4]
        t_area = (tx2 - tx1 + 1) * (ty2 - ty1 + 1)

        pos = i + 1
        while pos < N:
            x1, y1, x2, y2, s = boxes[pos]
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    area = (x2 - x1 + 1) * (y2 - y1 + 1)
                    ov = iw * ih / float(t_area + area - iw * ih)
                    if method == 1:
                        weight = 1 - ov if ov > Nt else 1.0
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0.0 if ov > Nt else 1.0
                    boxes[pos, 4] *= weight
                    if boxes[pos, 4] < threshold:
                        boxes[pos] = boxes[N - 1]
                        N -= 1
                        pos -= 1
            pos += 1
        i += 1
    return boxes[:N], N


def multiclass_nms(
    nms_func,
    boxes: np.ndarray,  # [N, num_cls or 1, box_dim]
    scores: np.ndarray,  # [N, num_cls]
    pre_max_size: int | None = None,
    post_max_size: int | None = None,
    score_thresh: float = 0.0,
    iou_threshold: float = 0.5,
):
    """Per-class NMS: returns ``selected_per_class`` — a list (len
    num_cls) of index arrays into N, or None for empty classes.

    ``nms_func(boxes, scores, pre_max_size, post_max_size,
    iou_threshold) -> indices`` — e.g. a wrapper over
    :func:`papc_tpu.cc.nms` / :func:`papc_tpu.cc.rotate_nms`.
    """
    assert boxes.ndim == 3, "bbox must have shape [N, num_cls, box_dim]"
    assert scores.ndim == 2, "score must have shape [N, num_cls]"
    num_classes = scores.shape[1]
    boxes_ids = (
        range(num_classes) if boxes.shape[1] > 1 else [0] * num_classes
    )
    selected_per_class = []
    for class_idx, boxes_idx in zip(range(num_classes), boxes_ids):
        class_scores = scores[:, class_idx]
        class_boxes = boxes[:, boxes_idx]
        if score_thresh > 0.0:
            keep_ids = np.flatnonzero(class_scores >= score_thresh)
            if len(keep_ids) == 0:
                selected_per_class.append(None)
                continue
            class_scores = class_scores[keep_ids]
            class_boxes = class_boxes[keep_ids]
        if len(class_scores) == 0:
            selected_per_class.append(None)
            continue
        keep = nms_func(
            class_boxes, class_scores, pre_max_size, post_max_size,
            iou_threshold,
        )
        if keep is None or len(keep) == 0:
            selected_per_class.append(None)
        elif score_thresh > 0.0:
            selected_per_class.append(keep_ids[keep])
        else:
            selected_per_class.append(np.asarray(keep))
    return selected_per_class


def standard_nms_func(rotated: bool = False):
    """Build an ``nms_func`` for :func:`multiclass_nms` backed by the
    native kernels (reference ``box_paddle_ops.nms``/``rotate_nms``
    topk-prefilter semantics, :394-442)."""
    from papc_tpu import cc
    from papc_tpu.detect import box_np

    def fn(boxes, scores, pre_max_size, post_max_size, iou_threshold):
        order = np.argsort(-scores)
        if pre_max_size is not None:
            order = order[:pre_max_size]
        cand = boxes[order]
        if rotated:
            keep_mask = cc.rotate_nms(
                cand[:, [0, 1, 3, 4, 6]] if cand.shape[1] == 7 else cand,
                iou_threshold,
            )
        else:
            if cand.shape[1] == 7:
                corners = box_np.center_to_corner_box2d(
                    cand[:, :2], cand[:, 3:5], cand[:, 6]
                )
                cand4 = box_np.corner_to_standup_nd(corners)
            else:
                cand4 = cand
            keep_mask = cc.nms(
                np.asarray(cand4, np.float32), iou_threshold
            )
        kept = order[keep_mask]
        if post_max_size is not None:
            kept = kept[:post_max_size]
        return kept

    return fn
