"""Region Proposal Network (detectron2 RPN + StandardRPNHead as configured
in configs/detectron/vitdet_b_vid.py:16-33).

Static shapes throughout: per-level top-k, then one batched (per-level)
NMS with fixed output capacity (post_nms_topk) and a validity mask.
Train-side machinery (anchor matching, sampling, losses) lives in
detection/training.py; ``propose(training=True)`` selects the train-time
(pre, post)_nms_topk values."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eventful_transformer_tpu.detection.anchors import multi_level_anchors
from eventful_transformer_tpu.detection.boxes import (
    apply_deltas,
    clip_boxes,
    nonempty_boxes,
)
from eventful_transformer_tpu.detection.nms import batched_nms
from eventful_transformer_tpu.ops.conv import conv2d, conv2d_init


class RPN:
    def __init__(
        self,
        in_channels=256,
        num_anchors=3,
        conv_dims=(-1, -1),
        anchor_sizes=((32,), (64,), (128,), (256,), (512,)),
        aspect_ratios=(0.5, 1.0, 2.0),
        strides=(4, 8, 16, 32, 64),
        anchor_offset=0.0,
        # (train, test) tuples per the reference config (:31-32); a bare int
        # is treated as the test-time value.
        pre_nms_topk=(2000, 1000),
        post_nms_topk=(1000, 300),
        nms_thresh=0.7,
        min_box_size=0.0,
    ):
        self.in_channels = in_channels
        self.num_anchors = num_anchors
        self.conv_dims = [in_channels if d == -1 else d for d in conv_dims]
        self.anchor_sizes = anchor_sizes
        self.aspect_ratios = tuple(aspect_ratios)
        self.strides = tuple(strides)
        self.anchor_offset = anchor_offset
        as_pair = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        self.pre_nms_topk = as_pair(pre_nms_topk)
        self.post_nms_topk = as_pair(post_nms_topk)
        self.nms_thresh = nms_thresh
        self.min_box_size = min_box_size

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_dims) + 2)
        params = {"convs": []}
        cin = self.in_channels
        for i, dim in enumerate(self.conv_dims):
            params["convs"].append(conv2d_init(keys[i], 3, 3, cin, dim))
            cin = dim
        params["objectness"] = conv2d_init(keys[-2], 1, 1, cin, self.num_anchors)
        params["deltas"] = conv2d_init(keys[-1], 1, 1, cin, self.num_anchors * 4)
        return params

    def anchors(self, feature_sizes):
        return [
            jnp.asarray(a)
            for a in multi_level_anchors(
                feature_sizes,
                self.strides,
                self.anchor_sizes,
                self.aspect_ratios,
                self.anchor_offset,
            )
        ]

    def head(self, params, feature):
        """feature (B, H, W, C) -> (logits (B, H*W*A), deltas (B, H*W*A, 4))."""
        x = feature
        for conv_params in params["convs"]:
            x = jax.nn.relu(conv2d(x, conv_params["kernel"], conv_params["bias"], padding=1))
        logits = conv2d(x, params["objectness"]["kernel"], params["objectness"]["bias"])
        deltas = conv2d(x, params["deltas"]["kernel"], params["deltas"]["bias"])
        b = feature.shape[0]
        return logits.reshape(b, -1), deltas.reshape(b, -1, 4)

    def propose(self, params, features, image_size, training=False):
        """features: list of (1, H_l, W_l, C). Returns (boxes (P, 4),
        scores (P,), mask (P,)) with P = post_nms_topk, batch 1.
        ``training`` selects the (train, test) topk pair (static)."""
        pre_nms_topk = self.pre_nms_topk[0 if training else 1]
        post_nms_topk = self.post_nms_topk[0 if training else 1]
        feature_sizes = [f.shape[1:3] for f in features]
        anchors = self.anchors(feature_sizes)
        all_boxes, all_scores, all_levels = [], [], []
        for level, (feature, level_anchors) in enumerate(zip(features, anchors)):
            logits, deltas = self.head(params, feature)
            logits, deltas = logits[0], deltas[0]
            k = min(pre_nms_topk, logits.shape[0])
            top_scores, top_idx = jax.lax.top_k(logits, k)
            top_deltas = deltas[top_idx]
            top_anchors = level_anchors[top_idx]
            boxes = apply_deltas(top_deltas, top_anchors, weights=(1.0, 1.0, 1.0, 1.0))
            boxes = clip_boxes(boxes, image_size)
            keep = nonempty_boxes(boxes, self.min_box_size)
            top_scores = jnp.where(keep, top_scores, -jnp.inf)
            all_boxes.append(boxes)
            all_scores.append(top_scores)
            all_levels.append(jnp.full((k,), level, jnp.int32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        levels = jnp.concatenate(all_levels)
        keep_idx, mask = batched_nms(
            boxes, scores, levels, self.nms_thresh, post_nms_topk
        )
        return boxes[keep_idx], jnp.where(mask, scores[keep_idx], -jnp.inf), mask

    @staticmethod
    def feature_sizes_for(input_size, strides):
        h, w = input_size
        return [(int(np.ceil(h / s)), int(np.ceil(w / s))) for s in strides]
