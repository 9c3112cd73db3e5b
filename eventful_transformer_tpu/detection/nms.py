"""Fixed-shape NMS for TPU.

torchvision/detectron2's NMS is a CUDA kernel with dynamic output size; the
TPU-native formulation is an iterative argmax-and-suppress loop with a STATIC
output capacity (``max_out``) and a validity mask — exactly the padded design
SURVEY.md §2.6 calls for. ``batched_nms`` uses detectron2's coordinate-offset
trick so boxes from different groups (pyramid levels / classes) never
suppress each other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.detection.boxes import box_area


def nms_padded(boxes, scores, iou_threshold, max_out):
    """Greedy NMS. boxes (N, 4), scores (N,) — scores of invalid/padded boxes
    must be -inf. Returns (indices (max_out,), mask (max_out,)): the kept box
    indices in descending-score order."""
    n = boxes.shape[0]
    area = box_area(boxes)

    def iou_with(box):
        lt = jnp.maximum(boxes[:, :2], box[:2])
        rb = jnp.minimum(boxes[:, 2:], box[2:])
        wh = jnp.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        box_a = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
        union = area + box_a - inter
        return jnp.where(union > 0, inter / union, 0.0)

    def body(carry, _):
        live_scores = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > -jnp.inf
        iou = iou_with(boxes[best])
        suppress = (iou > iou_threshold) | (
            jnp.arange(n) == best
        )  # remove the chosen box and its overlaps
        live_scores = jnp.where(valid & suppress, -jnp.inf, live_scores)
        return live_scores, (best.astype(jnp.int32), valid)

    _, (indices, mask) = jax.lax.scan(body, scores, None, length=max_out)
    return indices, mask


def batched_nms(boxes, scores, group_ids, iou_threshold, max_out):
    """Groupwise NMS via the coordinate-offset trick (detectron2
    layers/nms.py): shift each group's boxes to a disjoint region so
    cross-group IoU is zero, then run one plain NMS."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0)) + 1.0
    offsets = group_ids.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_padded(shifted, scores, iou_threshold, max_out)
