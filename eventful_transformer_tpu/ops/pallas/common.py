"""Helpers shared by the Pallas TPU kernels in this package.

These were originally duplicated per kernel module; a fix to the LN
formulation, the exact-copy precision rule, or the Mosaic row-block tile
constraint must apply to every kernel at once, so they live here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-6


def iota2(shape, dim):
    """2-D+ iota (TPU kernels cannot lower 1-D iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def ln_f32(x, scale, bias):
    """LayerNorm over the last axis, f32 accumulation (matches
    core.nn.layer_norm's formulation and LN_EPS)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def copy_precision(dtype):
    """Precision for one-hot copy matmuls, which must be EXACT.

    f32 inputs: DEFAULT runs the MXU through bf16 passes, quantizing the
    copies -> force HIGHEST. bf16 inputs: products (1.0 * value) are exact
    at DEFAULT, and Mosaic rejects HIGHEST bf16 operands ("Bad lhs type").
    """
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


# XLA's f32 erf (xla/client/lib/math.cc ErfImpl32): rational minimax on
# [-4, 4], ~1 ulp in f32 — Mosaic has no erf lowering, so the exact-GELU
# (torch nn.GELU default) is computed with the same polynomial XLA itself
# uses. Validated against jax.scipy.special.erf in tests.
_ERF_ALPHA = (
    -2.72614225801306e-10,
    2.77068142495902e-08,
    -2.10102402082508e-06,
    -5.69250639462346e-05,
    -7.34990630326855e-04,
    -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05,
    -2.13374055278905e-04,
    -1.68282697438203e-03,
    -7.37332916720468e-03,
    -1.42647390514189e-02,
)


def _poly(x, coeffs):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(x2, _ERF_ALPHA) / _poly(x2, _ERF_BETA)


def gelu_exact(x):
    """Exact (erf) GELU in f32, matching jax.nn.gelu(approximate=False)."""
    return x * 0.5 * (1.0 + erf_f32(x * (2.0**-0.5)))


def row_block(a0, a1, cap=512, fallback=0):
    """Largest divisor r of a0 with r*a1 <= cap AND r*a1 a multiple of the
    8-sublane tile (Mosaic block constraint). Returns ``fallback`` when no
    legal r exists — 0 tells callers to skip the kernel (av_softmax's
    fused bias), a0 falls back to whole-axis blocks (relpos, where the
    full per-axis tables are only a few hundred KB)."""
    r = max(1, min(a0, cap // a1))
    while r > 1 and (a0 % r or (r * a1) % 8):
        r -= 1
    if a0 % r or (r * a1) % 8:
        return fallback
    return r
