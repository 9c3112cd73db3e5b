"""NHWC convolution primitives for the detection head (uncounted, matching
the reference's plain nn.Conv2d usage in models/vitdet.py:75-125).

Kernels are stored HWIO (JAX-native); the torch converter transposes
OIHW -> HWIO."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, kernel, bias=None, stride=1, padding="SAME"):
    """x (B, H, W, C); kernel (kh, kw, Cin, Cout)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(x, kernel, bias=None, stride=2):
    """Transposed convolution matching torch ConvTranspose2d semantics.

    Kernel stored (kh, kw, Cout, Cin); with ``transpose_kernel=True`` this
    equals torch's gradient-convolution (verified bit-level vs torch)."""
    y = jax.lax.conv_transpose(
        x,
        kernel.astype(x.dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def max_pool2d(x, window, stride):
    """x (B, H, W, C), floor-mode valid pooling (torch default)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def conv2d_init(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    fan_in = kh * kw * cin
    scale = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    params = {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -scale, scale)}
    if bias:
        params["bias"] = jax.random.uniform(k2, (cout,), dtype, -scale, scale)
    return params


def conv_transpose2d_init(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    """Kernel stored (kh, kw, cout, cin) for transpose_kernel=True semantics."""
    fan_in = kh * kw * cin
    scale = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    params = {"kernel": jax.random.uniform(k1, (kh, kw, cout, cin), dtype, -scale, scale)}
    if bias:
        params["bias"] = jax.random.uniform(k2, (cout,), dtype, -scale, scale)
    return params
