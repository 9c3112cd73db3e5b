"""ROI heads, inference path.

StandardROIHeads: detectron2 StandardROIHeads + FastRCNNConvFCHead +
FastRCNNOutputLayers, as configured in configs/detectron/vitdet_b_vid.py:34-63.
Pipeline: multi-level ROIAlign over p2-p5 -> 4x [3x3 conv + LN + ReLU] ->
FC 1024 + ReLU -> class scores (C+1) and class-specific box deltas (4C) ->
softmax, score threshold, per-class NMS, top-k per image. All fixed-shape
with validity masks.

CascadeROIHeads: the 3-stage cascade of the COCO operating point
(reference configs/detectron/vitdet_b_coco.py:22-48): per-stage box heads
and predictors with Box2BoxTransform weights (10,10,5,5)/(20,20,10,10)/
(30,30,15,15), class-agnostic box regression; each stage refines the
previous stage's boxes, class probabilities are AVERAGED over stages and
the final boxes come from the last stage (detectron2
cascade_rcnn.py::CascadeROIHeads._forward_box test-time path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.detection.boxes import apply_deltas, clip_boxes
from eventful_transformer_tpu.detection.nms import batched_nms
from eventful_transformer_tpu.detection.roi_align import multilevel_roi_align
from eventful_transformer_tpu.ops.conv import conv2d, conv2d_init
from eventful_transformer_tpu.core.nn import layer_norm, trunc_normal


class StandardROIHeads:
    def __init__(
        self,
        num_classes,
        in_channels=256,
        pooler_scales=(1 / 4, 1 / 8, 1 / 16, 1 / 32),
        pooler_output=7,
        sampling_ratio=2,
        conv_dims=(256, 256, 256, 256),
        fc_dims=(1024,),
        box_weights=(10.0, 10.0, 5.0, 5.0),
        test_score_thresh=0.05,
        test_nms_thresh=0.5,
        test_topk_per_image=100,
    ):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.pooler_scales = pooler_scales
        self.pooler_output = pooler_output
        self.sampling_ratio = sampling_ratio
        self.conv_dims = conv_dims
        self.fc_dims = fc_dims
        self.box_weights = box_weights
        self.test_score_thresh = test_score_thresh
        self.test_nms_thresh = test_nms_thresh
        self.test_topk_per_image = test_topk_per_image

    # Box regression output dimension: class-specific (4 per class) for the
    # VID standard heads; the COCO cascade overrides with class-agnostic 4.
    cls_agnostic = False

    def _box_dim(self):
        return 4 if self.cls_agnostic else self.num_classes * 4

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_dims) + len(self.fc_dims) + 2)
        params = {"convs": [], "fcs": []}
        cin = self.in_channels
        i = 0
        for dim in self.conv_dims:
            p = conv2d_init(keys[i], 3, 3, cin, dim, bias=False)
            p["ln"] = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
            params["convs"].append(p)
            cin = dim
            i += 1
        flat = cin * self.pooler_output**2
        for dim in self.fc_dims:
            params["fcs"].append(
                {
                    "kernel": trunc_normal(keys[i], (flat, dim), std=0.01),
                    "bias": jnp.zeros((dim,)),
                }
            )
            flat = dim
            i += 1
        params["cls_score"] = {
            "kernel": trunc_normal(keys[i], (flat, self.num_classes + 1), std=0.01),
            "bias": jnp.zeros((self.num_classes + 1,)),
        }
        params["bbox_pred"] = {
            "kernel": trunc_normal(keys[i + 1], (flat, self._box_dim()), std=0.001),
            "bias": jnp.zeros((self._box_dim(),)),
        }
        return params

    def box_head(self, params, pooled):
        """pooled (R, 7, 7, C) -> features (R, fc_dim)."""
        x = pooled
        for conv_params in params["convs"]:
            x = conv2d(x, conv_params["kernel"], padding=1)
            x = layer_norm(x, conv_params["ln"])
            x = jax.nn.relu(x)
        # Flatten in torch channel-first order (C, H, W) for weight parity.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        for fc in params["fcs"]:
            x = jax.nn.relu(x @ fc["kernel"] + fc["bias"])
        return x

    def predict(self, params, features):
        scores = features @ params["cls_score"]["kernel"] + params["cls_score"]["bias"]
        deltas = features @ params["bbox_pred"]["kernel"] + params["bbox_pred"]["bias"]
        return scores, deltas

    def _pool(self, features, boxes):
        maps = [f[0] for f in features]
        return multilevel_roi_align(
            maps,
            boxes,
            self.pooler_scales,
            min_level=2,
            max_level=5,
            output_size=self.pooler_output,
            sampling_ratio=self.sampling_ratio,
        )

    def _nms_tail(self, probs, boxes, proposal_mask, image_size):
        """probs (P, C) foreground probabilities; boxes (P, C, 4) per-class
        boxes (broadcastable). Score threshold + per-class NMS + top-k."""
        boxes = clip_boxes(boxes, image_size)
        p, c = probs.shape
        boxes = jnp.broadcast_to(boxes, (p, c, 4))
        flat_boxes = boxes.reshape(p * c, 4)
        flat_scores = probs.reshape(p * c)
        classes = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (p, c)).reshape(-1)
        valid = (
            (flat_scores > self.test_score_thresh)
            & jnp.repeat(proposal_mask, c)
        )
        flat_scores = jnp.where(valid, flat_scores, -jnp.inf)
        keep_idx, keep_mask = batched_nms(
            flat_boxes,
            flat_scores,
            classes,
            self.test_nms_thresh,
            self.test_topk_per_image,
        )
        return {
            "boxes": flat_boxes[keep_idx],
            "scores": jnp.where(keep_mask, flat_scores[keep_idx], 0.0),
            "labels": classes[keep_idx],
            "mask": keep_mask,
        }

    def inference(self, params, features, proposals, proposal_mask, image_size):
        """features: list of (1, H_l, W_l, C) for p2..p5; proposals (P, 4).
        Returns dict with fixed-size boxes/scores/labels (+ mask)."""
        pooled = self._pool(features, proposals)
        box_features = self.box_head(params, pooled)
        scores, deltas = self.predict(params, box_features)
        probs = jax.nn.softmax(scores, axis=-1)[:, : self.num_classes]  # drop bg
        deltas = deltas.reshape(-1, self.num_classes, 4)
        boxes = apply_deltas(deltas, proposals[:, None, :], weights=self.box_weights)
        return self._nms_tail(probs, boxes, proposal_mask, image_size)


class CascadeROIHeads(StandardROIHeads):
    """3-stage cascade (reference configs/detectron/vitdet_b_coco.py:22-48),
    inference path. Class-agnostic box regression; stage k refines stage
    k-1's boxes with its own Box2BoxTransform weights; class probabilities
    are averaged across stages; final boxes come from the last stage."""

    cls_agnostic = True

    def __init__(
        self,
        num_classes,
        stage_box_weights=(
            (10.0, 10.0, 5.0, 5.0),
            (20.0, 20.0, 10.0, 10.0),
            (30.0, 30.0, 15.0, 15.0),
        ),
        with_mask=False,
        **kwargs,
    ):
        kwargs.pop("box_weights", None)
        super().__init__(num_classes, box_weights=stage_box_weights[0], **kwargs)
        self.stage_box_weights = tuple(tuple(w) for w in stage_box_weights)
        # The COCO base config is cascade_mask_rcnn: instance masks for the
        # final detections (detection/mask_head.py).
        if with_mask:
            from eventful_transformer_tpu.detection.mask_head import MaskHead

            self.mask_head = MaskHead(num_classes, in_channels=self.in_channels)
        else:
            self.mask_head = None

    def init(self, key):
        keys = jax.random.split(key, len(self.stage_box_weights) + 1)
        params = {
            "stages": [
                super(CascadeROIHeads, self).init(k)
                for k in keys[: len(self.stage_box_weights)]
            ]
        }
        if self.mask_head is not None:
            params["mask_head"] = self.mask_head.init(keys[-1])
        return params

    def inference(self, params, features, proposals, proposal_mask, image_size):
        boxes = proposals
        stage_probs = []
        for stage_params, weights in zip(params["stages"], self.stage_box_weights):
            pooled = self._pool(features, boxes)
            box_features = self.box_head(stage_params, pooled)
            scores, deltas = self.predict(stage_params, box_features)
            stage_probs.append(jax.nn.softmax(scores, axis=-1))
            # Class-agnostic refinement; refined boxes are the next stage's
            # proposals, clipped (detectron2 _create_proposals_from_boxes).
            boxes = apply_deltas(deltas.reshape(-1, 4), boxes, weights=weights)
            boxes = clip_boxes(boxes, image_size)
        probs = sum(stage_probs) / len(stage_probs)
        probs = probs[:, : self.num_classes]  # drop background
        result = self._nms_tail(probs, boxes[:, None, :], proposal_mask, image_size)
        if self.mask_head is not None:
            result["masks"] = self.mask_head.inference(
                params["mask_head"], features, result["boxes"], result["labels"]
            )
        return result
