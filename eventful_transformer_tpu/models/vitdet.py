"""ViTDet object detection (reference models/vitdet.py), fully JAX-native:
the detectron2 head is replaced by our detection/ package (RPN, ROIAlign,
padded NMS, ROI heads — SURVEY.md §7 design decision 4).

Layout is NHWC end-to-end (TPU-native); the patch embedding is a
reshape+matmul (Conv2d with kernel == stride). The model is stateful across
video frames (eventful backbone blocks); ``init_state``/``apply`` thread the
state explicitly, and ``pre_backbone``/``post_backbone`` expose the same
timing split as the reference (models/vitdet.py:186-220).
"""

from __future__ import annotations

from math import prod

import jax
import jax.numpy as jnp
import numpy as np

from eventful_transformer_tpu.core.backbones import ViTBackbone
from eventful_transformer_tpu.core.nn import Module, gelu, layer_norm, numeric_tuple
from eventful_transformer_tpu.detection.rpn import RPN
from eventful_transformer_tpu.detection.roi_heads import (
    CascadeROIHeads,
    StandardROIHeads,
)
from eventful_transformer_tpu.ops.conv import (
    conv2d,
    conv2d_init,
    conv_transpose2d,
    conv_transpose2d_init,
    max_pool2d,
)
from eventful_transformer_tpu.utils.image import as_float32

LN_EPS = 1e-6


class LinearEmbedding(Module):
    """Patch embedding (reference models/vitdet.py:17-52): Conv2d with
    kernel == stride == patch_size, as a reshape+matmul. Uncounted, matching
    the reference's plain nn.Conv2d."""

    def __init__(self, input_channels, dim, patch_size):
        self.input_channels = input_channels
        self.dim = dim
        self.patch_size = tuple(patch_size)

    def init(self, key):
        fan_in = self.input_channels * prod(self.patch_size)
        scale = 1.0 / np.sqrt(fan_in)
        k1, k2 = jax.random.split(key)
        return {
            # (C * ph * pw, dim), flattened in torch Conv2d (C, h, w) order
            "kernel": jax.random.uniform(k1, (fan_in, self.dim), jnp.float32, -scale, scale),
            "bias": jax.random.uniform(k2, (self.dim,), jnp.float32, -scale, scale),
        }

    def apply(self, ctx, params, x):
        """x (B, C, H, W) -> tokens (B, H/p * W/p, dim)."""
        del ctx
        b, c, h, w = x.shape
        ph, pw = self.patch_size
        x = x.reshape(b, c, h // ph, ph, w // pw, pw)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # (B, H', W', C, ph, pw)
        x = x.reshape(b, (h // ph) * (w // pw), c * ph * pw)
        return jnp.matmul(x, params["kernel"].astype(x.dtype)) + params["bias"].astype(
            x.dtype
        )


class SimplePyramid(Module):
    """ViTDet feature pyramid (reference models/vitdet.py:75-125), NHWC."""

    def __init__(self, scale_factors, dim, out_channels):
        assert all(s in (4.0, 2.0, 1.0, 0.5) for s in scale_factors)
        self.scale_factors = tuple(scale_factors)
        self.dim = dim
        self.out_channels = out_channels

    def _mid_dim(self, scale):
        return {4.0: self.dim // 4, 2.0: self.dim // 2}.get(scale, self.dim)

    def init(self, key):
        stages = []
        for scale in self.scale_factors:
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            stage = {}
            if scale == 4.0:
                stage["deconv_1"] = conv_transpose2d_init(k1, 2, 2, self.dim, self.dim // 2)
                stage["deconv_ln"] = {
                    "scale": jnp.ones((self.dim // 2,)),
                    "bias": jnp.zeros((self.dim // 2,)),
                }
                stage["deconv_2"] = conv_transpose2d_init(k2, 2, 2, self.dim // 2, self.dim // 4)
            elif scale == 2.0:
                stage["deconv_1"] = conv_transpose2d_init(k1, 2, 2, self.dim, self.dim // 2)
            mid = self._mid_dim(scale)
            stage["conv_1"] = conv2d_init(k3, 1, 1, mid, self.out_channels, bias=False)
            stage["ln_1"] = {
                "scale": jnp.ones((self.out_channels,)),
                "bias": jnp.zeros((self.out_channels,)),
            }
            stage["conv_2"] = conv2d_init(k4, 3, 3, self.out_channels, self.out_channels, bias=False)
            stage["ln_2"] = {
                "scale": jnp.ones((self.out_channels,)),
                "bias": jnp.zeros((self.out_channels,)),
            }
            stages.append(stage)
        return {"stages": stages}

    def apply(self, ctx, params, x):
        """x (B, H, W, dim) -> list of NHWC maps at x{4,2,1,0.5} + extra /2."""
        del ctx
        outputs = []
        for scale, stage in zip(self.scale_factors, params["stages"]):
            y = x
            if scale == 4.0:
                y = conv_transpose2d(y, stage["deconv_1"]["kernel"], stage["deconv_1"]["bias"])
                y = layer_norm(y, stage["deconv_ln"], LN_EPS)
                y = gelu(y)
                y = conv_transpose2d(y, stage["deconv_2"]["kernel"], stage["deconv_2"]["bias"])
            elif scale == 2.0:
                y = conv_transpose2d(y, stage["deconv_1"]["kernel"], stage["deconv_1"]["bias"])
            elif scale == 0.5:
                y = max_pool2d(y, 2, 2)
            y = conv2d(y, stage["conv_1"]["kernel"])
            y = layer_norm(y, stage["ln_1"], LN_EPS)
            y = conv2d(y, stage["conv_2"]["kernel"], padding=1)
            y = layer_norm(y, stage["ln_2"], LN_EPS)
            outputs.append(y)
        # Extra level: stride-2 subsample of the last map (MaxPool2d(1, 2)).
        outputs.append(outputs[-1][:, ::2, ::2, :])
        return outputs


class ViTDetPreprocessing:
    """Normalization + bottom-right square padding
    (reference models/vitdet.py:223-251). Expects [0, 1]-scaled input.

    The reference normalizes FIRST and then zero-pads, so pretrained
    weights expect exactly 0 in the padded region. Callers that hand in a
    pre-padded fixed-shape frame (required for a single jit program over
    variable-sized video frames) pass ``content_hw = (h, w)`` of the real
    content; the padded region is re-zeroed after normalization so the
    numerics match the reference regardless of what the host padded with.
    """

    def __init__(self, input_shape, normalize_mean, normalize_std):
        self.input_shape = tuple(input_shape)
        self.mean = jnp.asarray(normalize_mean, jnp.float32).reshape(-1, 1, 1)
        self.std = jnp.asarray(normalize_std, jnp.float32).reshape(-1, 1, 1)

    def __call__(self, x, content_hw=None):
        # normalize in f32 but keep the caller's compute dtype (a bf16
        # serving pipeline must not silently promote to f32 downstream)
        x = ((x.astype(jnp.float32) * 255.0 - self.mean) / self.std).astype(
            x.dtype
        )
        c, h, w = self.input_shape
        pads = [(0, 0)] * (x.ndim - 2) + [(0, h - x.shape[-2]), (0, w - x.shape[-1])]
        x = jnp.pad(x, pads)
        if content_hw is not None:
            content_hw = jnp.asarray(content_hw)
            if content_hw.ndim == 2:
                # per-batch-element content sizes (B, 2) — the DP eval path
                # runs one video per data shard, each with its own resize
                rows = jnp.arange(h)[None, :] < content_hw[:, :1]  # (B, h)
                cols = jnp.arange(w)[None, :] < content_hw[:, 1:2]  # (B, w)
                mask = rows[:, None, :, None] & cols[:, None, None, :]
                x = x * mask.astype(x.dtype)
            else:
                rows = jnp.arange(h) < content_hw[0]
                cols = jnp.arange(w) < content_hw[1]
                x = x * (rows[:, None] & cols[None, :]).astype(x.dtype)
        return x


class ViTDet(Module):
    """ViTDet detection model (reference models/vitdet.py:128-220)."""

    def __init__(
        self,
        backbone_config,
        classes,
        input_shape,
        normalize_mean,
        normalize_std,
        output_channels,
        patch_size,
        scale_factors,
        detectron2_config=None,  # accepted for config parity; head is native
        rpn_config=None,
        roi_config=None,
    ):
        del detectron2_config
        input_c, input_h, input_w = input_shape
        patch_size = numeric_tuple(patch_size, length=2)
        self.input_shape = tuple(input_shape)
        self.backbone_input_size = (input_h // patch_size[0], input_w // patch_size[1])
        self.preprocessing = ViTDetPreprocessing(input_shape, normalize_mean, normalize_std)
        dim = backbone_config["block_config"]["dim"]
        self.dim = dim
        self.embedding = LinearEmbedding(input_c, dim, patch_size)
        self.backbone = ViTBackbone(input_size=self.backbone_input_size, **backbone_config)
        self.pyramid = SimplePyramid(scale_factors, dim, output_channels)
        self.proposal_generator = RPN(
            in_channels=output_channels, **(rpn_config or {})
        )
        roi_config = dict(roi_config or {})
        # The COCO operating point uses 3-stage cascade heads (+ the
        # cascade_mask_rcnn base's mask head)
        # (reference configs/detectron/vitdet_b_coco.py:22-48); VID uses the
        # single-stage standard heads (configs/detectron/vitdet_b_vid.py:35).
        cascade = roi_config.pop("cascade", False)
        with_mask = roi_config.pop("with_mask", False)
        if cascade:
            roi_config["with_mask"] = with_mask
        roi_class = CascadeROIHeads if cascade else StandardROIHeads
        self.roi_heads = roi_class(
            num_classes=classes, in_channels=output_channels, **roi_config
        )

    def init(self, key):
        return self.sub_init(
            key,
            {
                "embedding": self.embedding,
                "backbone": self.backbone,
                "pyramid": self.pyramid,
                "proposal_generator": self.proposal_generator,
                "roi_heads": self.roi_heads,
            },
        )

    def init_state(self, batch=1, dtype=jnp.float32):
        return self.backbone.init_state(batch, dtype)

    def precompute(self, params):
        return self.backbone.precompute(params["backbone"])

    # -- reference-parity split (models/vitdet.py:186-220) --------------------

    def pre_backbone(self, ctx, params, x, content_hw=None):
        """x (B, C, H, W) any dtype -> tokens (B, N, dim).

        ``content_hw``: (h, w) of the real (non-padding) content when ``x``
        was pre-padded host-side; see ViTDetPreprocessing.
        """
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        else:
            x = as_float32(np.asarray(x)) if isinstance(x, np.ndarray) else x
        x = self.preprocessing(x, content_hw)
        return self.embedding.apply(ctx, params["embedding"], x)

    def apply_backbone(self, ctx, params, state, tokens, aux=None, mode=None):
        return self.backbone.apply(
            ctx, params["backbone"], state, tokens, aux, mode=mode
        )

    def post_backbone(self, ctx, params, tokens):
        """tokens (B, N, dim) -> detections dict (fixed shapes + masks)."""
        b = tokens.shape[0]
        h, w = self.backbone_input_size
        x = tokens.reshape(b, h, w, self.dim)
        features = self.pyramid.apply(ctx, params["pyramid"], x)
        image_size = (self.input_shape[1], self.input_shape[2])
        proposals, scores, mask = self.proposal_generator.propose(
            params["proposal_generator"], features, image_size
        )
        return self.roi_heads.inference(
            params["roi_heads"], features[:4], proposals, mask, image_size
        )

    def apply(self, ctx, params, state, x, aux=None, content_hw=None, mode=None):
        """``mode``: static flush/incremental selection for eventful
        backbones (see Block.apply) — per-video frame loops where frame 0
        always flushes should pass it so the hot loop carries no per-block
        lax.cond (profiled: the cond's state-buffer layout copies cost ~30%
        of the eventful 672 backbone)."""
        tokens = self.pre_backbone(ctx, params, x, content_hw)
        tokens, state = self.apply_backbone(ctx, params, state, tokens, aux, mode=mode)
        return self.post_backbone(ctx, params, tokens), state
