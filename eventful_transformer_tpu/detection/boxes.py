"""Box utilities: delta transforms, clipping, IoU.

JAX reimplementation of the detectron2 pieces the reference instantiates
(models/vitdet.py:180-184 via configs/detectron/vitdet_b_vid.py):
``Box2BoxTransform`` (weights per config) and the box ops used by RPN/ROI
inference. Boxes are (x1, y1, x2, y2), XYXY_ABS.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# detectron2's scale clamp: log(1000 / 16)
SCALE_CLAMP = math.log(1000.0 / 16.0)


def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply (dx, dy, dw, dh) regression deltas to boxes.

    deltas: (..., 4) or (..., C, 4); boxes broadcastable (..., 4).
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def clip_boxes(boxes, image_size):
    """Clip boxes to [0, w] x [0, h]; image_size = (h, w)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU: (N, 4) x (M, 4) -> (N, M)."""
    area_a = box_area(boxes_a)[:, None]
    area_b = box_area(boxes_b)[None, :]
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nonempty_boxes(boxes, threshold=0.0):
    """Mask of boxes with both sides > threshold (detectron2 Boxes.nonempty)."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)
