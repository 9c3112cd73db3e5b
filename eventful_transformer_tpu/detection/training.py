"""Detector train-side machinery: anchor matching, proposal sampling, RPN
and Fast R-CNN losses.

TPU-native reimplementation of the last detectron2 capability the VID
config declares (reference configs/detectron/vitdet_b_vid.py:25-31,37-41:
Matchers, batch_size_per_image, positive_fraction; detectron2 supplies the
code). Everything is static-shape: ground truth arrives padded with a
validity mask, sampling returns boolean masks instead of index lists, and
the random subsample is a priority trick (rank of per-anchor uniforms)
instead of a dynamic permutation.

The reference never trains the detector (SURVEY.md §3.3), so these losses
exist for capability parity; semantics follow detectron2's
matcher.py/sampling.py/rpn.py/fast_rcnn.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.detection.boxes import box_area, iou_matrix


def get_deltas(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Inverse box transform (detectron2 Box2BoxTransform.get_deltas):
    the (dx, dy, dw, dh) that map ``src_boxes`` onto ``target_boxes``."""
    wx, wy, ww, wh = weights
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h
    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h
    # guard degenerate sources (padded slots); callers mask these out
    src_w = jnp.maximum(src_w, 1e-6)
    src_h = jnp.maximum(src_h, 1e-6)
    return jnp.stack(
        [
            wx * (tgt_cx - src_cx) / src_w,
            wy * (tgt_cy - src_cy) / src_h,
            ww * jnp.log(jnp.maximum(tgt_w, 1e-6) / src_w),
            wh * jnp.log(jnp.maximum(tgt_h, 1e-6) / src_h),
        ],
        axis=-1,
    )


class Matcher:
    """detectron2 Matcher: bucket each prediction (anchor/proposal) by its
    best IoU against ground truth.

    thresholds: ascending cut points; labels: len(thresholds)+1 values from
    {-1, 0, 1} (ignore / negative / positive). allow_low_quality_matches
    additionally marks, for every gt box, the anchors achieving its highest
    IoU as positive (detectron2 set_low_quality_matches_)."""

    def __init__(self, thresholds, labels, allow_low_quality_matches=False):
        thresholds = list(thresholds)
        assert all(low <= high for low, high in zip(thresholds, thresholds[1:]))
        assert len(labels) == len(thresholds) + 1
        assert all(l in (-1, 0, 1) for l in labels)
        self.thresholds = thresholds
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, quality, gt_mask=None):
        """quality: (G, A) IoU of gt x predictions; gt_mask (G,) marks valid
        (non-padding) gt rows. Returns (matches (A,) int32 gt indices,
        match_labels (A,) int8 in {-1, 0, 1})."""
        if gt_mask is not None:
            quality = jnp.where(gt_mask[:, None], quality, -1.0)
        matched_vals = jnp.max(quality, axis=0)
        matches = jnp.argmax(quality, axis=0).astype(jnp.int32)
        labels = jnp.full(matched_vals.shape, self.labels[0], jnp.int8)
        edges = [-jnp.inf] + self.thresholds + [jnp.inf]
        for label, low, high in zip(self.labels, edges[:-1], edges[1:]):
            in_bucket = (matched_vals >= low) & (matched_vals < high)
            labels = jnp.where(in_bucket, jnp.int8(label), labels)
        if self.allow_low_quality_matches:
            best_per_gt = jnp.max(quality, axis=1, keepdims=True)  # (G, 1)
            # ties included, zero-quality gt excluded (detectron2 semantics)
            is_best = (quality == best_per_gt) & (best_per_gt > 0)
            low_quality = jnp.any(is_best, axis=0)
            labels = jnp.where(low_quality, jnp.int8(1), labels)
        return matches, labels


def subsample_labels(key, labels, num_samples, positive_fraction):
    """detectron2 subsample_labels with static shapes: returns boolean masks
    (sampled_pos, sampled_neg) over all entries. Positives (label 1) are
    capped at int(num_samples * positive_fraction); negatives (label 0)
    fill the remainder. Selection is uniform without replacement via
    random priorities + rank thresholding."""
    pos = labels == 1
    neg = labels == 0
    num_pos_cap = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos), num_pos_cap)
    num_neg = jnp.minimum(jnp.sum(neg), num_samples - num_pos)

    def pick(mask, count, k):
        prio = jnp.where(mask, jax.random.uniform(k, mask.shape), -1.0)
        # rank via double argsort (descending): rank[i] = position of i
        order = jnp.argsort(-prio)
        rank = jnp.argsort(order)
        return mask & (rank < count)

    k1, k2 = jax.random.split(key)
    return pick(pos, num_pos, k1), pick(neg, num_neg, k2)


def smooth_l1(pred, target, beta=0.0):
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def giou_loss(pred_boxes, target_boxes):
    """Generalized IoU loss, 1 - GIoU (detectron2 giou_loss)."""
    lt = jnp.maximum(pred_boxes[..., :2], target_boxes[..., :2])
    rb = jnp.minimum(pred_boxes[..., 2:], target_boxes[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(pred_boxes) + box_area(target_boxes) - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    lt_c = jnp.minimum(pred_boxes[..., :2], target_boxes[..., :2])
    rb_c = jnp.maximum(pred_boxes[..., 2:], target_boxes[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0)
    enclosing = wh_c[..., 0] * wh_c[..., 1]
    giou = iou - jnp.where(enclosing > 0, (enclosing - union) / enclosing, 0.0)
    return 1.0 - giou


def rpn_losses(
    key,
    anchors,
    objectness_logits,
    pred_deltas,
    gt_boxes,
    gt_mask,
    anchor_matcher=None,
    batch_size_per_image=256,
    positive_fraction=0.5,
    box_weights=(1.0, 1.0, 1.0, 1.0),
    smooth_l1_beta=0.0,
):
    """RPN objectness + box losses for ONE image
    (configs/detectron/vitdet_b_vid.py:25-31; detectron2 rpn.py::losses).

    anchors (A, 4); objectness_logits (A,); pred_deltas (A, 4);
    gt_boxes (G, 4) padded; gt_mask (G,). Returns a dict of scalars, each
    normalized by batch_size_per_image (detectron2's per-image normalizer).
    """
    if anchor_matcher is None:
        anchor_matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    quality = iou_matrix(gt_boxes, anchors)
    matches, labels = anchor_matcher(quality, gt_mask)
    pos_mask, neg_mask = subsample_labels(
        key, labels, batch_size_per_image, positive_fraction
    )
    sampled = pos_mask | neg_mask
    # objectness: binary CE with logits over the sampled anchors
    target = pos_mask.astype(jnp.float32)
    bce = jnp.maximum(objectness_logits, 0) - objectness_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(objectness_logits))
    )
    objectness_loss = jnp.sum(jnp.where(sampled, bce, 0.0)) / batch_size_per_image
    # box regression: l1 on deltas vs matched gt, positive anchors only
    matched_gt = gt_boxes[matches]
    target_deltas = get_deltas(anchors, matched_gt, box_weights)
    reg = jnp.sum(smooth_l1(pred_deltas, target_deltas, smooth_l1_beta), axis=-1)
    box_loss = jnp.sum(jnp.where(pos_mask, reg, 0.0)) / batch_size_per_image
    return {"loss_rpn_cls": objectness_loss, "loss_rpn_loc": box_loss}


def sample_proposals(
    key,
    proposals,
    proposal_mask,
    gt_boxes,
    gt_classes,
    gt_mask,
    num_classes,
    proposal_matcher=None,
    batch_size_per_image=128,
    positive_fraction=0.25,
    append_gt=True,
):
    """ROI-head proposal sampling for ONE image (detectron2
    ROIHeads.label_and_sample_proposals): append gt to proposals, match,
    subsample. Returns (boxes, classes (bg = num_classes), sampled_mask,
    matched gt boxes) — all fixed-shape."""
    if proposal_matcher is None:
        proposal_matcher = Matcher([0.5], [0, 1])
    if append_gt:
        proposals = jnp.concatenate([proposals, gt_boxes])
        proposal_mask = jnp.concatenate([proposal_mask, gt_mask])
    quality = iou_matrix(gt_boxes, proposals)
    quality = jnp.where(proposal_mask[None, :], quality, -1.0)
    matches, labels = proposal_matcher(quality, gt_mask)
    labels = jnp.where(proposal_mask, labels, jnp.int8(-1))
    pos_mask, neg_mask = subsample_labels(
        key, labels, batch_size_per_image, positive_fraction
    )
    classes = jnp.where(
        pos_mask, gt_classes[matches], jnp.int32(num_classes)  # bg class
    )
    return proposals, classes, pos_mask | neg_mask, gt_boxes[matches]


def fast_rcnn_losses(
    scores,
    pred_boxes,
    classes,
    sampled_mask,
    matched_gt_boxes,
    num_classes,
    box_loss_weight=2.0,
):
    """Fast R-CNN classification + GIoU box losses for ONE image
    (configs/detectron/vitdet_b_vid.py:60-62: box_reg_loss_type="giou",
    loss_weight loss_box_reg 2.0; detectron2 fast_rcnn.py::losses).

    scores (P, C+1); pred_boxes (P, 4) decoded predictions for the matched
    class (class-agnostic or gathered by class upstream); classes (P,) with
    bg == num_classes; sampled_mask (P,)."""
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    picked = jnp.take_along_axis(log_probs, classes[:, None].astype(jnp.int32), axis=-1)[:, 0]
    n_sampled = jnp.maximum(jnp.sum(sampled_mask), 1)
    cls_loss = -jnp.sum(jnp.where(sampled_mask, picked, 0.0)) / n_sampled
    fg = sampled_mask & (classes < num_classes)
    reg = giou_loss(pred_boxes, matched_gt_boxes)
    box_loss = box_loss_weight * jnp.sum(jnp.where(fg, reg, 0.0)) / n_sampled
    return {"loss_cls": cls_loss, "loss_box_reg": box_loss}
