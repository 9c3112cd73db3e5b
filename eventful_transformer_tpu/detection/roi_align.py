"""ROIAlign (V2 / aligned) in pure JAX.

Reimplements detectron2's ROIAlignV2 (used via ROIPooler in
configs/detectron/vitdet_b_vid.py:45-50): half-pixel aligned coordinates,
bilinear sampling averaged over a per-bin sample grid, multi-level pooling
with the canonical level assignment (canonical_box_size=224, level 4).

TPU deviation (static shapes): detectron2's ``sampling_ratio=0`` picks
ceil(bin_size) samples per bin PER ROI (data-dependent); here the sample
count is a static ``sampling_ratio`` (default 2). At the canonical level
assignment, bins are ~2px so ceil == 2 for most boxes; the residual
difference is a sub-pixel sampling density change inside an average.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear(features, y, x):
    """Sample features (H, W, C) at float coords; points outside
    [-1, size] give 0 (detectron2 ROIAlign border semantics).

    TPU-first: 2-D advanced indexing lowers to slow general gathers; flatten
    the map and gather ROWS by linear index instead (fast on TPU)."""
    h, w = features.shape[:2]
    c = features.shape[-1]
    flat = features.reshape(h * w, c)
    outside = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0).astype(features.dtype)
    lx = (x - x0).astype(features.dtype)

    def at(yi, xi):
        idx = (yi * w + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(yi.shape + (c,))

    val = (
        at(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + at(y0, x1) * ((1 - ly) * lx)[..., None]
        + at(y1, x0) * (ly * (1 - lx))[..., None]
        + at(y1, x1) * (ly * lx)[..., None]
    )
    return jnp.where(outside[..., None], 0.0, val)


def roi_align(features, boxes, scale, output_size=7, sampling_ratio=2):
    """features (H, W, C); boxes (R, 4) in image coords; returns
    (R, output_size, output_size, C)."""
    r = boxes.shape[0]
    n = sampling_ratio
    # Aligned (V2): continuous coordinate = pixel * scale - 0.5.
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    grid = jnp.arange(output_size, dtype=features.dtype)
    samp = (jnp.arange(n, dtype=features.dtype) + 0.5) / n
    # (R, out, n): y = y1 + (bin + frac) * bin_h
    ys = y1[:, None, None] + (grid[None, :, None] + samp[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (grid[None, :, None] + samp[None, None, :]) * bin_w[:, None, None]
    # full sample grid: (R, out, out, n, n)
    y = jnp.broadcast_to(ys[:, :, None, :, None], (r, output_size, output_size, n, n))
    x = jnp.broadcast_to(xs[:, None, :, None, :], (r, output_size, output_size, n, n))
    vals = _bilinear(features, y, x)  # (R, out, out, n, n, C)
    return vals.mean(axis=(3, 4))


def assign_levels(boxes, min_level, max_level, canonical_size=224, canonical_level=4):
    """detectron2 assign_boxes_to_levels: floor(canonical_level +
    log2(sqrt(area) / canonical_size)), clamped."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    level = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8)
    )
    return jnp.clip(level, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features,
    boxes,
    scales,
    min_level,
    max_level,
    output_size=7,
    sampling_ratio=2,
):
    """Pool each roi from its assigned pyramid level, WITHOUT the pool-all-
    levels-and-blend redundancy: the levels are packed into one flat
    (sum H_l*W_l, C) map, and every roi samples it with per-roi level
    parameters (scale / height / width / row offset) — one gather pass.

    features: list of (H_l, W_l, C); boxes (R, 4); scales: per-level 1/stride.
    Returns (R, output_size, output_size, C)."""
    import numpy as np

    levels = assign_levels(boxes, min_level, max_level)
    c = features[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in features])
    heights = np.array([f.shape[0] for f in features])
    widths = np.array([f.shape[1] for f in features])
    offsets = np.concatenate([[0], np.cumsum(heights * widths)[:-1]])
    li = levels - min_level
    scale_r = jnp.asarray(np.asarray(scales, np.float32))[li]
    h_r = jnp.asarray(heights, jnp.float32)[li]
    w_r = jnp.asarray(widths, jnp.float32)[li]
    w_int = jnp.asarray(widths, jnp.int32)[li]
    off_r = jnp.asarray(offsets, jnp.int32)[li]

    r = boxes.shape[0]
    n = sampling_ratio
    x1 = boxes[:, 0] * scale_r - 0.5
    y1 = boxes[:, 1] * scale_r - 0.5
    x2 = boxes[:, 2] * scale_r - 0.5
    y2 = boxes[:, 3] * scale_r - 0.5
    bin_w = (x2 - x1) / output_size
    bin_h = (y2 - y1) / output_size
    grid = jnp.arange(output_size, dtype=jnp.float32)
    samp = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    ys = y1[:, None, None] + (grid[None, :, None] + samp[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (grid[None, :, None] + samp[None, None, :]) * bin_w[:, None, None]
    y = jnp.broadcast_to(ys[:, :, None, :, None], (r, output_size, output_size, n, n))
    x = jnp.broadcast_to(xs[:, None, :, None, :], (r, output_size, output_size, n, n))

    def expand(v):
        return v.reshape((r,) + (1,) * 4)

    h_b, w_b = expand(h_r), expand(w_r)
    outside = (y < -1.0) | (y > h_b) | (x < -1.0) | (x > w_b)
    y = jnp.clip(y, 0.0, h_b - 1)
    x = jnp.clip(x, 0.0, w_b - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, expand(h_r).astype(jnp.int32) - 1)
    x1i = jnp.minimum(x0 + 1, expand(w_r).astype(jnp.int32) - 1)
    ly = (y - y0).astype(flat.dtype)
    lx = (x - x0).astype(flat.dtype)
    off_b, wi_b = expand(off_r), expand(w_int)

    def at(yi, xi):
        idx = (off_b + yi * wi_b + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(yi.shape + (c,))

    vals = (
        at(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + at(y0, x1i) * ((1 - ly) * lx)[..., None]
        + at(y1i, x0) * (ly * (1 - lx))[..., None]
        + at(y1i, x1i) * (ly * lx)[..., None]
    )
    vals = jnp.where(outside[..., None], 0.0, vals)
    return vals.mean(axis=(3, 4))
