"""Torch-compatible separable interpolation as dense matmuls.

The reference resizes position encodings with
``torch.nn.functional.interpolate(mode="bicubic", align_corners=False)``
(eventful_transformer/utils.py:89-91,180-184). PyTorch's bicubic uses the
cubic-convolution kernel with A = -0.75 and half-pixel source coordinates;
``jax.image.resize`` uses the Keys kernel (A = -0.5), so we build the torch
kernel explicitly.

TPU-first design: because all sizes are static, each separable pass is a
dense (out, in) weight matrix built in numpy at trace time and applied as a
matmul — MXU-friendly, fuses with neighbors, and exact to construct. These
run once per model build (results are loop-invariant and hoisted out of the
frame scan), so simplicity and bit-parity beat cleverness here.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _cubic_kernel(t, a=-0.75):
    """Cubic convolution weights for the 4 taps around fractional offset t."""
    # distances of taps (x0-1, x0, x0+1, x0+2) from the sample point
    d = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t])
    ad = np.abs(d)
    w_near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0
    w_far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a
    return np.where(ad <= 1.0, w_near, np.where(ad < 2.0, w_far, 0.0))


def _resize_matrix_bicubic(in_size, out_size):
    """(out_size, in_size) matrix reproducing torch bicubic align_corners=False."""
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    src = (i + 0.5) * scale - 0.5
    x0 = np.floor(src)
    t = src - x0
    weights = _cubic_kernel(t)  # (4, out)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(x0 + tap - 1, 0, in_size - 1).astype(np.int64)
        np.add.at(mat, (np.arange(out_size), idx), weights[tap])
    return mat.astype(np.float32)


def _triangle_kernel(d):
    return np.maximum(0.0, 1.0 - np.abs(d))


def _resize_matrix_bilinear(in_size, out_size, antialias=False):
    """(out, in) matrix for torch bilinear align_corners=False resize.

    ``antialias=True`` follows PIL's algorithm exactly (torch's antialiased
    path is a copy of it): filter support scaled by the downscale factor,
    out-of-range taps excluded, weights renormalized per output pixel.
    """
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        filterscale = max(scale, 1.0)
        support = 1.0 * filterscale  # triangle filter support
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            j = np.arange(xmin, xmax)
            w = _triangle_kernel((j - center + 0.5) / filterscale)
            mat[i, xmin:xmax] = w / w.sum()
    else:
        i = np.arange(out_size, dtype=np.float64)
        src = (i + 0.5) * scale - 0.5
        x0 = np.floor(src).astype(np.int64)
        t = src - x0
        for tap, w in ((0, 1.0 - t), (1, t)):
            idx = np.clip(x0 + tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def _apply_separable(x, mat_h, mat_w):
    """Apply per-axis resize matrices to the last two dims of x."""
    y = jnp.einsum("oh,...hw->...ow", jnp.asarray(mat_h), x)
    y = jnp.einsum("pw,...ow->...op", jnp.asarray(mat_w), y)
    return y


def resize_bicubic(x, out_size):
    """Resize the last two dims of x to ``out_size`` with torch-parity
    bicubic (align_corners=False, antialias=False)."""
    in_h, in_w = x.shape[-2:]
    out_h, out_w = out_size
    if (in_h, in_w) == (out_h, out_w):
        return x
    return _apply_separable(
        x, _resize_matrix_bicubic(in_h, out_h), _resize_matrix_bicubic(in_w, out_w)
    )


def resize_bilinear(x, out_size, antialias=False):
    """Resize the last two dims with torch bilinear align_corners=False."""
    in_h, in_w = x.shape[-2:]
    out_h, out_w = out_size
    if (in_h, in_w) == (out_h, out_w):
        return x
    return _apply_separable(
        x,
        _resize_matrix_bilinear(in_h, out_h, antialias),
        _resize_matrix_bilinear(in_w, out_w, antialias),
    )


def resize_bicubic_1d(x, out_size):
    """Resize the last dim with torch-parity bicubic."""
    in_size = x.shape[-1]
    if in_size == out_size:
        return x
    mat = _resize_matrix_bicubic(in_size, out_size)
    return jnp.einsum("ow,...w->...o", jnp.asarray(mat), x)


def avg_pool_2d(x, pool_size):
    """Average-pool the last two dims (kernel == stride, floor mode),
    matching torch ``avg_pool2d`` defaults. Implemented as a reshape-mean
    (requires divisibility, which all reference configs satisfy)."""
    ph, pw = pool_size
    h, w = x.shape[-2:]
    assert h % ph == 0 and w % pw == 0, (x.shape, pool_size)
    y = x.reshape(x.shape[:-2] + (h // ph, ph, w // pw, pw))
    return y.mean(axis=(-3, -1))


def avg_pool_1d(x, pool_size):
    """Average-pool the last dim (kernel == stride)."""
    n = x.shape[-1]
    assert n % pool_size == 0, (x.shape, pool_size)
    return x.reshape(x.shape[:-1] + (n // pool_size, pool_size)).mean(axis=-1)
