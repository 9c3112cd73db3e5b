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

from eventful_transformer_tpu.detection.boxes import iou_matrix


def nms_padded(boxes, scores, iou_threshold, max_out):
    """Exact greedy NMS as a parallel fixpoint. boxes (N, 4), scores (N,) —
    scores of invalid/padded boxes must be -inf. Returns (indices (max_out,),
    mask (max_out,)): the kept box indices in descending-score order.

    TPU-first formulation: the greedy keep-set is the unique fixpoint of
        keep(i) = valid(i) and not exists j < i: keep(j) and iou(i, j) > t
    (boxes sorted by score desc; j < i is a total order so ties are
    deterministic). Jacobi iteration converges in suppression-chain-depth
    rounds (typically < 10) of cheap parallel matrix ops — vs the naive
    max_out (hundreds) of sequential argmax+suppress steps, which dominated
    the detection head's runtime on this platform."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    valid = s > -jnp.inf
    iou = iou_matrix(b, b)
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    )  # [i, j] True when j comes before i in score order
    suppressor = (iou > iou_threshold) & earlier  # j can suppress i

    def step(state):
        keep, _ = state
        new_keep = valid & ~jnp.any(suppressor & keep[None, :], axis=1)
        return new_keep, jnp.any(new_keep != keep)

    def cond(state):
        return state[1]

    keep, _ = jax.lax.while_loop(cond, step, (valid, jnp.ones((), bool)))
    # First max_out kept boxes, in score order (== greedy's output order).
    kept_rank = jnp.cumsum(keep) - 1
    sort_key = jnp.where(keep, kept_rank, n + jnp.arange(n))
    pos = jnp.argsort(sort_key)[:max_out]
    indices = order[pos].astype(jnp.int32)
    mask = jnp.arange(max_out) < jnp.sum(keep)
    return indices, mask


def batched_nms(boxes, scores, group_ids, iou_threshold, max_out, max_candidates=4096):
    """Groupwise NMS via the coordinate-offset trick (detectron2
    layers/nms.py): shift each group's boxes to a disjoint region so
    cross-group IoU is zero, then run one plain NMS.

    ``max_candidates`` statically truncates to the top candidates by score
    before the O(M^2) IoU matrix — exact whenever fewer than that many boxes
    are valid (score > -inf), which holds for every realistic detection
    workload (outputs are capped at ``max_out`` << max_candidates)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0)) + 1.0
    offsets = group_ids.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    n = boxes.shape[0]
    if max_candidates is not None and n > max_candidates:
        top_scores, top_idx = jax.lax.top_k(scores, max_candidates)
        indices, mask = nms_padded(
            shifted[top_idx], top_scores, iou_threshold, max_out
        )
        return top_idx[indices].astype(jnp.int32), mask
    return nms_padded(shifted, scores, iou_threshold, max_out)
