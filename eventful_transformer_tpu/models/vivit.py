"""Factorized ViViT action recognition (reference models/vivit.py).

TPU-first divergences from the reference:

  * The per-time-step spatial sub-model loop (models/vivit.py:146-147 — the
    reference's documented hot-loop bottleneck, models/vivit.py:107-119) is a
    single ``lax.scan`` over frames with the eventful state as carry: one
    compilation, no per-step dispatch.
  * Tubelet embedding (models/vivit.py:153-192, a Conv3d with kernel ==
    stride) is expressed as patch-extraction reshape + one large matmul —
    exactly equivalent and MXU-native.
  * Preprocessing (variable-length videos → fixed views) runs on host
    (numpy/jax eager); everything after view construction is jitted.
"""

from __future__ import annotations

from math import prod

import jax
import jax.numpy as jnp
import numpy as np

from eventful_transformer_tpu.core import counting

# Flush-then-scan for the per-view frame loop (static flush branch, no
# per-block lax.cond). Measured (docs/PERF_NOTES.md round 3, K400 point):
# under a lax.scan (unroll=1) the split is ~7% SLOWER than cond dispatch
# (it fragments the program; cond state copies are cheap at N=197), but
# with the frame loop FULLY UNROLLED the split wins decisively — 46.7 vs
# 43.5 clips/s eventful (cond+unroll), vs 42.7 (cond+scan): the cond's
# per-block state double-buffering disappears and the flush frame inlines
# as iteration 0. split_flush="auto" on FactorizedViViT applies the rule
# (split iff the steady-state loop is fully unrolled); EVT_SPLIT_FLUSH=1/0
# still force-overrides for A/B.
import os as _os

_SPLIT_FLUSH_ENV = _os.environ.get("EVT_SPLIT_FLUSH")
from eventful_transformer_tpu.core.backbones import ViTBackbone
from eventful_transformer_tpu.core.nn import (
    Dropout,
    Linear,
    Module,
    layer_norm,
    trunc_normal,
)
from eventful_transformer_tpu.ops.resize import resize_bilinear

LN_EPS = 1e-6


class TubeletEmbedding(Module):
    """Linear tubelet embedding (reference models/vivit.py:153-192).
    Equivalent to Conv3d(kernel=stride=tubelet) but implemented as patch
    extraction + matmul. Deliberately NOT counted, matching the reference's
    plain (uncounted) nn.Conv3d."""

    def __init__(self, input_channels, dim, tubelet_shape):
        self.input_channels = input_channels
        self.dim = dim
        self.tubelet_shape = tuple(tubelet_shape)

    def init(self, key):
        fan_in = self.input_channels * prod(self.tubelet_shape)
        k1, k2 = jax.random.split(key)
        scale = 1.0 / np.sqrt(fan_in)
        return {
            # (C * t * h * w, dim), flattened in torch Conv3d (C, t, h, w) order
            "kernel": jax.random.uniform(k1, (fan_in, self.dim), jnp.float32, -scale, scale),
            "bias": jax.random.uniform(k2, (self.dim,), jnp.float32, -scale, scale),
        }

    # Strided-2D-conv lowering of the tubelet contraction: "auto" enables on
    # TPU (the conv emitter beats the einsum's dilated-conv lowering 5.8 vs
    # 13.2 ms per 32-clip step, docs/PERF_NOTES.md round 3); True forces
    # (used by tests — it is plain XLA, valid on any backend); False keeps
    # the einsum. A Pallas patchify+matmul kernel was tried and does not
    # lower: Mosaic rejects every (t, c, th, tw)->row shape cast
    # (unsupported vector relayouts).
    conv_embed = "auto"

    def _use_conv(self):
        if isinstance(self.conv_embed, bool):
            return self.conv_embed
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    def apply(self, ctx, params, x):
        del ctx  # uncounted (reference models/vivit.py:169 note in SURVEY §2.2)
        b, t, c, h, w = x.shape
        tt, th, tw = self.tubelet_shape
        if self._use_conv():
            # (B*q, tt*C, H, W) 2D conv, kernel == stride: the (q, tt) and
            # (tt, C) merges are free reshapes (adjacent row-major dims),
            # and XLA's strided-conv emitter does the patch gather at ~2.3x
            # the einsum lowering's effective bandwidth.
            kernel = params["kernel"].astype(x.dtype).reshape(c, tt, th, tw, -1)
            kr = jnp.transpose(kernel, (4, 1, 0, 2, 3)).reshape(-1, tt * c, th, tw)
            xi = x.reshape(b * (t // tt), tt * c, h, w)
            y = jax.lax.conv_general_dilated(
                xi, kr, window_strides=(th, tw), padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NHWC"),
            )
            y = y.reshape(b, t // tt, (h // th) * (w // tw), -1)
            return y + params["bias"].astype(x.dtype)
        x = x.reshape(b, t // tt, tt, c, h // th, th, w // tw, tw)
        # Contract the patch dims against the torch-Conv3d-ordered (C, t, h,
        # w) kernel directly: an einsum lets XLA feed the permutation into
        # the matmul instead of materializing the 8-D transpose (profiled
        # ~12 ms/call of copy+reshape on the old explicit-transpose path).
        kernel = params["kernel"].astype(x.dtype).reshape(c, tt, th, tw, -1)
        y = jnp.einsum("bqtcyhxw,cthwd->bqyxd", x, kernel)
        y = y.reshape(b, t // tt, (h // th) * (w // tw), -1)
        return y + params["bias"].astype(x.dtype)


class ViViTSubModel(Module):
    """A factorized ViViT sub-model, spatial or temporal
    (reference models/vivit.py:272-303). Prepends a class token (first
    position), runs the backbone + final LN, extracts the class token."""

    def __init__(self, input_size, backbone_config):
        self.dim = backbone_config["block_config"]["dim"]
        self.backbone = ViTBackbone(
            input_size=input_size, has_class_token=True, **backbone_config
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "class_token": trunc_normal(k1, (1, 1, self.dim)),
            "backbone": self.backbone.init(k2),
            "layer_norm": {
                "scale": jnp.ones((self.dim,)),
                "bias": jnp.zeros((self.dim,)),
            },
        }

    def init_state(self, batch, dtype=jnp.float32):
        return self.backbone.init_state(batch, dtype)

    def precompute(self, params):
        return self.backbone.precompute(params["backbone"])

    def apply(self, ctx, params, state, x, aux=None, mode=None):
        cls = jnp.broadcast_to(
            params["class_token"].astype(x.dtype), (x.shape[0], 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
        x, state = self.backbone.apply(
            ctx, params["backbone"], state, x, aux, mode=mode
        )
        x = layer_norm(x, params["layer_norm"], LN_EPS)
        return x[:, 0], state


class ViViTPreprocessing:
    """Value normalization + spatial/temporal view construction
    (reference models/vivit.py:195-269). Host-side: inputs have
    data-dependent length; outputs have static view shapes."""

    def __init__(
        self,
        input_shape,
        normalize_mean,
        normalize_std,
        spatial_views,
        temporal_stride,
        temporal_views,
    ):
        self.input_shape = tuple(input_shape)
        self.normalize_mean = normalize_mean
        self.normalize_std = normalize_std
        self.spatial_views = spatial_views
        self.temporal_stride = temporal_stride
        self.temporal_views = temporal_views

    def __call__(self, x):
        """x: (batch, time, channel, height, width), uint8 or float.
        Returns a list of views, each (batch, t, c, h, w) float32."""
        t, _, h, w = self.input_shape
        x = np.asarray(x)

        # Repeat the last frame if the video is too short.
        view_size = self.temporal_stride * t
        if x.shape[1] < view_size:
            n_pad = view_size - x.shape[1]
            pad = np.broadcast_to(x[:, -1:], (x.shape[0], n_pad) + x.shape[2:])
            x = np.concatenate([x, pad], axis=1)

        # Temporal views.
        if self.temporal_views == 1:
            starts = [(x.shape[1] - view_size) // 2]
        else:
            spacing = (x.shape[1] - view_size) / (self.temporal_views - 1)
            starts = [int(k * spacing) for k in range(self.temporal_views)]
        views = [x[:, i : i + view_size : self.temporal_stride] for i in starts]

        # Normalize and resize (short-edge cover, antialiased bilinear,
        # matching torchvision resize_to_fit in utils/image.py:52-70).
        out = []
        for v in views:
            v = v.astype(np.float32) / 255.0 if v.dtype == np.uint8 else v.astype(np.float32)
            v = (v - self.normalize_mean) / self.normalize_std
            scale = max(h / v.shape[-2], w / v.shape[-1])
            if scale != 1.0:
                size = (round(scale * v.shape[-2]), round(scale * v.shape[-1]))
                v = np.asarray(resize_bilinear(jnp.asarray(v), size, antialias=True))
            out.append(v)

        # Spatial crops (spatial-major ordering, reference models/vivit.py:267).
        if self.spatial_views == 1:
            starts = [((out[0].shape[-2] - h) // 2, (out[0].shape[-1] - w) // 2)]
        else:
            h_spacing = (out[0].shape[-2] - h) / (self.spatial_views - 1)
            w_spacing = (out[0].shape[-1] - w) / (self.spatial_views - 1)
            starts = [
                (int(k * h_spacing), int(k * w_spacing)) for k in range(self.spatial_views)
            ]
        return [v[..., i : i + h, j : j + w] for i, j in starts for v in out]


class FactorizedViViT(Module):
    """Spatio-temporally factorized ViViT (reference models/vivit.py:18-150).

    ``apply_views`` is the jittable entry point: preprocessed views in,
    class probabilities out. ``apply`` = host preprocessing + apply_views.
    """

    def __init__(
        self,
        classes,
        input_shape,
        normalize_mean,
        normalize_std,
        spatial_config,
        spatial_views,
        temporal_config,
        temporal_stride,
        temporal_views,
        tubelet_shape,
        batch_views=True,
        dropout_rate=0.0,
        spatial_only=False,
        temporal_only=False,
    ):
        assert not (spatial_only and temporal_only)
        input_shape = tuple(input_shape)
        tubelet_shape = tuple(tubelet_shape)
        input_t, input_c, input_h, input_w = input_shape
        self.classes = classes
        self.batch_views = batch_views
        self.spatial_only = spatial_only
        self.temporal_only = temporal_only
        self.n_views = spatial_views * temporal_views

        self.preprocessing = ViViTPreprocessing(
            input_shape,
            normalize_mean,
            normalize_std,
            spatial_views,
            temporal_stride,
            temporal_views,
        )
        dim = spatial_config["block_config"]["dim"]
        self.dim = dim
        self.embedding = TubeletEmbedding(input_c, dim, tubelet_shape)
        backbone_input_size = (input_h // tubelet_shape[1], input_w // tubelet_shape[2])
        self.spatial_model = ViViTSubModel(backbone_input_size, spatial_config)
        self.temporal_model = ViViTSubModel(
            (input_t // tubelet_shape[0],), temporal_config
        )
        self.dropout = Dropout(dropout_rate)
        self.classifier = Linear(dim, classes)

    # Frame-scan unroll factor (int, or True for full unroll): fewer
    # while-loop back-edge copies of the eventful state per frame at the
    # cost of compile time (see counting.scan). Default 1 — the copies are
    # moderate at ViViT scale; benchmarks override per measurement.
    frame_scan_unroll = 1

    # Static flush/incremental split of the frame loop: "auto" splits iff
    # the steady-state loop is fully unrolled (measured crossover, see the
    # module-level note); True/False force. EVT_SPLIT_FLUSH overrides all.
    split_flush = "auto"

    def _split_flush(self, n_steady):
        if _SPLIT_FLUSH_ENV is not None:
            return _SPLIT_FLUSH_ENV == "1"
        if isinstance(self.split_flush, bool):
            return self.split_flush
        unroll = self.frame_scan_unroll
        return unroll is True or (
            isinstance(unroll, int) and unroll >= n_steady
        )

    # -- parameters -----------------------------------------------------------

    def init(self, key):
        return self.sub_init(
            key,
            {
                "embedding": self.embedding,
                "spatial_model": self.spatial_model,
                "temporal_model": self.temporal_model,
                "classifier": self.classifier,
            },
        )

    # -- forward ----------------------------------------------------------------

    def apply(self, ctx, params, video):
        """Full pipeline on a raw video (host preprocessing + device compute).
        video: (batch, time, channel, height, width)."""
        batch_size = video.shape[0]
        if self.temporal_only:
            return self._forward_temporal(ctx, params, jnp.asarray(video), batch_size)
        views = self.preprocessing(video)
        views = jnp.asarray(np.stack(views, axis=1))  # (batch, views, t, c, h, w)
        return self.apply_views(ctx, params, views)

    def apply_views(self, ctx, params, views):
        """Jittable: views (batch, n_views, t, c, h, w) -> class probabilities
        (or spatial features if spatial_only)."""
        batch_size = views.shape[0]
        x = self._forward_spatial(ctx, params, views)
        if self.spatial_only:
            return x
        return self._forward_temporal(ctx, params, x, batch_size)

    def _forward_spatial(self, ctx, params, views):
        b, v = views.shape[:2]
        if self.batch_views:
            x = views.reshape((b * v,) + views.shape[2:])
            x = self._forward_view(ctx, params, x)
        else:
            x = jnp.stack(
                [self._forward_view(ctx, params, views[:, i]) for i in range(v)], axis=1
            )
            x = x.reshape((b * v,) + x.shape[2:])
        return x

    def _forward_view(self, ctx, params, x):
        """Embed and run the spatial sub-model over each time step via scan
        (replacing the reference's Python loop, models/vivit.py:146-147)."""
        x = self.embedding.apply(ctx, params["embedding"], x)
        # (batch, time, patch, dim)
        batch = x.shape[0]
        state = self.spatial_model.init_state(batch, x.dtype)
        aux = self.spatial_model.precompute(params["spatial_model"])

        frames = jnp.moveaxis(x, 1, 0)
        unroll = self.frame_scan_unroll
        if self._split_flush(frames.shape[0] - 1):
            # Flush-then-scan: frame 0 of each view always flushes (state is
            # fresh, utils/evaluate resets per video), so the branch is
            # STATIC — no per-block flush/incremental lax.cond in the scan.
            y0, state = self.spatial_model.apply(
                ctx, params["spatial_model"], state, frames[0], aux, mode="flush"
            )

            def body(ctx, state, frame):
                y, state = self.spatial_model.apply(
                    ctx, params["spatial_model"], state, frame, aux,
                    mode="incremental",
                )
                return state, y

            _, ys = counting.scan(body, ctx, state, frames[1:], unroll=unroll)
            ys = jnp.concatenate([y0[None], ys], axis=0)
        else:

            def body(ctx, state, frame):
                y, state = self.spatial_model.apply(
                    ctx, params["spatial_model"], state, frame, aux
                )
                return state, y

            _, ys = counting.scan(body, ctx, state, frames, unroll=unroll)
        return jnp.moveaxis(ys, 0, 1)  # (batch, time, dim)

    def _forward_temporal(self, ctx, params, x, batch_size):
        x = x.reshape((-1,) + x.shape[-2:])
        state = self.temporal_model.init_state(x.shape[0], x.dtype)
        x, _ = self.temporal_model.apply(ctx, params["temporal_model"], state, x)
        x = self.dropout.apply(ctx, None, x)
        x = self.classifier.apply(ctx, params["classifier"], x)
        x = x.reshape(batch_size, -1, x.shape[-1])
        x = x.mean(axis=-2)
        return jax.nn.softmax(x, axis=-1)
