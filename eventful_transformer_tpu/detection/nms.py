"""Fixed-shape NMS for TPU.

torchvision/detectron2's NMS is a CUDA kernel with dynamic output size; the
TPU-native formulation has a STATIC output capacity (``max_out``) and a
validity mask — exactly the padded design SURVEY.md §2.6 calls for.
``batched_nms`` uses detectron2's coordinate-offset trick so boxes from
different groups (pyramid levels / classes) never suppress each other.

Two formulations, dispatched on candidate count:

* small N (<= ``_BLOCK``): the greedy keep-set is the unique fixpoint of
      keep(i) = valid(i) and not exists j < i: keep(j) and iou(i, j) > t
  (boxes sorted by score desc; j < i is a total order so ties are
  deterministic). Jacobi iteration converges in suppression-chain-depth
  rounds of cheap parallel matrix ops.
* large N: blocked kept-set greedy. The O(N^2) IoU matrix of the Jacobi
  form costs ~67 MB of HBM traffic per round at N=4096 (it was the
  dominant cost of the ViTDet head at batch 1); but greedy suppression
  only ever comes from KEPT boxes, and only the first ``max_out`` keeps
  are observable. Processing score-sorted blocks sequentially against a
  fixed-capacity kept-set buffer does work proportional to
  N * (block + max_out) instead of N^2, and is EXACT: a box kept beyond
  ``max_out`` can only suppress boxes that would also land beyond
  ``max_out`` (keep ranks are monotone in score order), so dropping it
  from the suppressor set cannot change the first ``max_out`` outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.detection.boxes import iou_matrix

# Candidate-block size for the kept-set formulation. 1024 keeps the
# per-block IoU matrices (block^2 and block x max_out) comfortably in a
# few MB while bounding the sequential block count at the ViTDet
# candidate scales (4096 -> 4 blocks).
_BLOCK = 1024


def _fixpoint_keep(valid, suppressor):
    """Greedy keep-set as a Jacobi fixpoint. valid (N,) bool; suppressor
    (N, N) bool where [i, j] means j (earlier in score order) can suppress
    i. Converges in suppression-chain-depth rounds (typically < 10)."""

    def step(state):
        keep, _ = state
        new_keep = valid & ~jnp.any(suppressor & keep[None, :], axis=1)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(
        lambda state: state[1], step, (valid, jnp.ones((), bool))
    )
    return keep


def nms_padded(boxes, scores, iou_threshold, max_out, block=_BLOCK):
    """Exact greedy NMS with static output capacity. boxes (N, 4), scores
    (N,) — scores of invalid/padded boxes must be -inf. Returns
    (indices (max_out,), mask (max_out,)): kept box indices in
    descending-score order."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order].astype(jnp.float32)
    s = scores[order]
    valid = s > -jnp.inf

    if n <= block:
        iou = iou_matrix(b, b)
        earlier = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        )  # [i, j] True when j comes before i in score order
        keep = _fixpoint_keep(valid, (iou > iou_threshold) & earlier)
        # First max_out kept boxes, in score order (== greedy's output order).
        kept_rank = jnp.cumsum(keep) - 1
        sort_key = jnp.where(keep, kept_rank, n + jnp.arange(n))
        pos = jnp.argsort(sort_key)[:max_out]
        indices = order[pos].astype(jnp.int32)
        mask = jnp.arange(max_out) < jnp.sum(keep)
        return indices, mask

    # Blocked kept-set greedy (see module docstring).
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])
        s = jnp.concatenate([s, jnp.full((pad,), -jnp.inf, s.dtype)])
    out_slots = jnp.arange(max_out, dtype=jnp.int32)
    blk_iota = jnp.arange(block, dtype=jnp.int32)
    earlier = blk_iota[None, :] < blk_iota[:, None]  # within-block order

    def body(i, carry):
        kept_boxes, kept_pos, kept_cnt = carry
        blk = jax.lax.dynamic_slice_in_dim(b, i * block, block)
        sv = jax.lax.dynamic_slice_in_dim(s, i * block, block)
        alive = sv > -jnp.inf
        # Suppression by the (observable) kept set from earlier blocks.
        iou_k = iou_matrix(blk, kept_boxes)
        kmask = out_slots < kept_cnt
        alive &= ~jnp.any((iou_k > iou_threshold) & kmask[None, :], axis=1)
        # Within-block greedy fixpoint (all remaining suppressors are here).
        iou_b = iou_matrix(blk, blk)
        keep = _fixpoint_keep(alive, (iou_b > iou_threshold) & earlier)
        # Append kept boxes to the buffer (one-hot matmul: TPU scatters
        # lower badly — measured, docs/PERF_NOTES.md round 4).
        pos_in_kept = kept_cnt + jnp.cumsum(keep) - 1
        ok = keep & (pos_in_kept < max_out)
        onehot = (
            (pos_in_kept[None, :] == out_slots[:, None]) & ok[None, :]
        ).astype(jnp.float32)
        kept_boxes = kept_boxes + onehot @ blk
        src_pos = (i * block + blk_iota).astype(jnp.float32)
        kept_pos = kept_pos + onehot @ src_pos[:, None]
        kept_cnt = kept_cnt + jnp.sum(keep)
        return kept_boxes, kept_pos, kept_cnt

    kept_boxes = jnp.zeros((max_out, 4), jnp.float32)
    kept_pos = jnp.zeros((max_out, 1), jnp.float32)
    kept_cnt = jnp.zeros((), jnp.int32)
    # Early exit once the kept set is FULL — exact: keeps are discovered in
    # score order, so with kept_cnt >= max_out every output slot is final
    # (mask compares out_slots < kept_cnt only below max_out) and later
    # blocks are unobservable. Typical detection frames fill the kept set
    # in the first block or two, skipping most of the serial chain.
    def cond(state):
        i, _, _, kept_cnt = state
        return (i < n_blocks) & (kept_cnt < max_out)

    def step(state):
        i, kept_boxes, kept_pos, kept_cnt = state
        kept_boxes, kept_pos, kept_cnt = body(
            i, (kept_boxes, kept_pos, kept_cnt)
        )
        return i + 1, kept_boxes, kept_pos, kept_cnt

    _, kept_boxes, kept_pos, kept_cnt = jax.lax.while_loop(
        cond, step, (jnp.zeros((), jnp.int32), kept_boxes, kept_pos, kept_cnt)
    )
    # kept_pos holds positions in sorted order (exact in f32: < 2^24).
    indices = order[kept_pos[:, 0].astype(jnp.int32)].astype(jnp.int32)
    mask = out_slots < kept_cnt
    return indices, mask


def batched_nms(boxes, scores, group_ids, iou_threshold, max_out, max_candidates=4096):
    """Groupwise NMS via the coordinate-offset trick (detectron2
    layers/nms.py): shift each group's boxes to a disjoint region so
    cross-group IoU is zero, then run one plain NMS.

    ``max_candidates`` statically truncates to the top candidates by score
    before the blocked NMS — exact whenever fewer than that many boxes
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
