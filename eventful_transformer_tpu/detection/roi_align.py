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
    """Pool every roi from every level and blend with the one-hot level
    assignment (static shapes; levels are few so the redundancy is small).

    features: list of (H_l, W_l, C); boxes (R, 4); scales: per-level 1/stride.
    Returns (R, output_size, output_size, C)."""
    levels = assign_levels(boxes, min_level, max_level)
    out = None
    for i, (fm, scale) in enumerate(zip(features, scales)):
        pooled = roi_align(fm, boxes, scale, output_size, sampling_ratio)
        sel = (levels == (min_level + i)).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
