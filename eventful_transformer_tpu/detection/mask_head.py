"""Mask R-CNN mask head, inference path (detectron2
MaskRCNNConvUpsampleHead as configured by the COCO operating point's
cascade_mask_rcnn base — reference configs/detectron/vitdet_b_coco.py
derives from mask_rcnn_vitdet.py: 4x [3x3 conv 256 + LN + ReLU] ->
2x2 stride-2 deconv + ReLU -> 1x1 predictor -> sigmoid, 14x14 ROIAlign
pooling over p2-p5, per-detection class channel.

The reference only EVALUATES boxes on VID, but the COCO model carries this
head; with it, ``ViTDet`` outputs 28x28 instance masks alongside boxes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.core.nn import layer_norm, trunc_normal
from eventful_transformer_tpu.detection.roi_align import multilevel_roi_align
from eventful_transformer_tpu.ops.conv import (
    conv2d,
    conv2d_init,
    conv_transpose2d,
    conv_transpose2d_init,
)


class MaskHead:
    def __init__(
        self,
        num_classes,
        in_channels=256,
        conv_dims=(256, 256, 256, 256),
        pooler_scales=(1 / 4, 1 / 8, 1 / 16, 1 / 32),
        pooler_output=14,
        sampling_ratio=2,
    ):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.conv_dims = tuple(conv_dims)
        self.pooler_scales = tuple(pooler_scales)
        self.pooler_output = pooler_output
        self.sampling_ratio = sampling_ratio

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_dims) + 2)
        params = {"convs": []}
        cin = self.in_channels
        for i, dim in enumerate(self.conv_dims):
            p = conv2d_init(keys[i], 3, 3, cin, dim, bias=False)
            p["ln"] = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
            params["convs"].append(p)
            cin = dim
        params["deconv"] = conv_transpose2d_init(keys[-2], 2, 2, cin, cin)
        params["predictor"] = {
            "kernel": trunc_normal(keys[-1], (1, 1, cin, self.num_classes), std=0.001),
            "bias": jnp.zeros((self.num_classes,)),
        }
        return params

    def inference(self, params, features, boxes, labels):
        """features: p2-p5 list of (1, H_l, W_l, C); boxes (P, 4) final
        detections; labels (P,). Returns (P, 28, 28) mask probabilities for
        each detection's class."""
        maps = [f[0] for f in features]
        x = multilevel_roi_align(
            maps,
            boxes,
            self.pooler_scales,
            min_level=2,
            max_level=5,
            output_size=self.pooler_output,
            sampling_ratio=self.sampling_ratio,
        )  # (P, 14, 14, C)
        for conv_params in params["convs"]:
            x = conv2d(x, conv_params["kernel"], padding=1)
            x = layer_norm(x, conv_params["ln"])
            x = jax.nn.relu(x)
        x = conv_transpose2d(
            x, params["deconv"]["kernel"], params["deconv"]["bias"], stride=2
        )
        x = jax.nn.relu(x)
        logits = conv2d(x, params["predictor"]["kernel"], params["predictor"]["bias"])
        # (P, 28, 28, num_classes) -> the detected class's channel
        picked = jnp.take_along_axis(
            logits, labels[:, None, None, None].astype(jnp.int32), axis=-1
        )[..., 0]
        return jax.nn.sigmoid(picked)
