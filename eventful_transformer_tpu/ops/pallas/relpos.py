"""Fused decomposed relative-position bias + logits add.

The XLA path (core/embeddings.py) computes the two per-axis terms with
middle-batched einsums ('abhwc,hkc->abhwk') that lower to minor-dim-permuted
5-D layout copies running at ~2 GB/s (profiled: the largest single cost of
the ViTDet backbone even after the flat-expander fix), then an expander
matmul and an add — several full passes over the (B, H, N, Np) logits.

This kernel computes everything in ONE pass: for each query-row stripe
(fixed qy), the y term is a small matmul against that stripe's table slice,
the x term a row-wise contraction against the x table, both are expanded to
the flat key axis with constant 0/1 expander matmuls (exact row copies),
and the result is added to the logits block in VMEM. HBM traffic = read
x, q once, write x' once — the algorithmic minimum.

Semantics match RelativePositionEmbedding.apply exactly (reference
utils.py:139-171): terms accumulate in f32, round once to the working
dtype, and add to the logits in the working dtype. Tables arrive already
resized/pooled (precompute), so pooled attention (p != a) is supported.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(heads, g, a1, p0, p1, np_):
    def kernel(x_ref, q_ref, yk_ref, xr_ref, e_ref, out_ref):
        xr = xr_ref[...].astype(jnp.float32)  # (a1, p1, c)
        e = e_ref[...]  # (p0 + p1, Np) f32
        # One qy stripe per iteration, ALL heads batched into one matmul
        # each (per-head loops serialize thousands of tiny MXU ops).
        for gg in range(g):
            qb = q_ref[0, :, gg].astype(jnp.float32)  # (H, a1, c)
            flat = qb.reshape(heads * a1, -1)
            ty = jax.lax.dot_general(
                flat, yk_ref[gg].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H*a1, p0)
            tx = jnp.sum(qb[:, :, None, :] * xr[None], axis=-1)  # (H, a1, p1)
            t = jax.lax.dot_general(
                jnp.concatenate([ty, tx.reshape(heads * a1, p1)], axis=-1),
                e,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H*a1, Np)
            out_ref[0, :, gg] = (
                x_ref[0, :, gg]
                + t.reshape(heads, a1, np_).astype(out_ref.dtype)
            )

    return kernel


@partial(jax.jit, static_argnames=("a", "p", "interpret"))
def relpos_bias_add(x, q, y_rel, x_rel, *, a, p, interpret=False):
    """x (B, H, N, Np) attention logits; q (B, H, N, c); y_rel (a0, p0, c);
    x_rel (a1, p1, c); a = (a0, a1) query grid, p = (p0, p1) key grid
    (pooled). Returns x + decomposed relative-position bias."""
    bsz, heads, n, np_ = x.shape
    a0, a1 = a
    p0, p1 = p
    c = q.shape[-1]
    assert n == a0 * a1 and np_ == p0 * p1, (x.shape, a, p)
    dtype = x.dtype
    # qy stripes per grid instance: bound the resident x block to ~8 MB
    budget = 8 * 2**20
    stripe = heads * a1 * np_ * x.dtype.itemsize
    g = max(1, min(a0, budget // max(stripe, 1)))
    while a0 % g:
        g -= 1
    grid = (bsz, a0 // g)
    k_idx = jnp.arange(np_)
    e_y = (k_idx[None, :] // p1 == jnp.arange(p0)[:, None]).astype(jnp.float32)
    e_x = (k_idx[None, :] % p1 == jnp.arange(p1)[:, None]).astype(jnp.float32)
    e = jnp.concatenate([e_y, e_x], axis=0)  # (p0 + p1, Np)
    x5 = x.reshape(bsz, heads, a0, a1, np_)
    q5 = q.reshape(bsz, heads, a0, a1, c)
    out = pl.pallas_call(
        _make_kernel(heads, g, a1, p0, p1, np_),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, heads, g, a1, np_), lambda i, j: (i, 0, j, 0, 0)),
                pl.BlockSpec((1, heads, g, a1, c), lambda i, j: (i, 0, j, 0, 0)),
                pl.BlockSpec((g, p0, c), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((a1, p1, c), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((p0 + p1, np_), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, heads, g, a1, np_), lambda i, j: (i, 0, j, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, heads, a0, a1, np_), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x5, q5, y_rel.astype(dtype), x_rel.astype(dtype), e)
    return out.reshape(bsz, heads, n, np_)


# ---------------------------------------------------------------------------
# v2: flat-layout row-block kernel (the production path).
#
# The stripe kernel above serializes a python loop of small per-stripe
# matmuls and blocks on 5-D views whose minor dims (a1 = 14/42/64) pad badly
# to the vector tile — measured 2x slower than XLA end-to-end. v2 fixes both
# structurally:
#   * operands stay in the flat, well-tiled (B*H, N, Np) layout; the grid
#     covers (head-chunks, row-blocks of r whole query rows);
#   * ALL work is 2-D MXU matmuls: q_blk against the block's OWN y-table
#     slice (r*p0 rows — the only part of the y table its tokens can touch)
#     and the shared x table, then exact 0/1 mask/collapse/expand matmuls
#     built from iotas in VMEM.
# HBM traffic = read x, q once, write x' once; the bias tensor never exists
# in HBM. Terms accumulate in f32 and round once to the working dtype.


from eventful_transformer_tpu.ops.pallas.common import (  # noqa: E402
    iota2 as _iota2,
    row_block as _common_row_block,
)


def _make_kernel_v2(m, bn, r, a1, p0, p1, np_):
    rp0 = r * p0
    xp = a1 * p1

    def kernel(x_ref, q_ref, yk_ref, xr_ref, out_ref):
        # Same dtype trajectory as the XLA flat path (embeddings._flat_terms):
        # every matmul outputs the WORKING dtype; the mask/collapse/expand
        # matmuls are exact single-nonzero row copies at any precision, so
        # DEFAULT is exact in bf16 and only f32 operands need HIGHEST
        # (DEFAULT would run them through quantizing bf16 MXU passes).
        c = q_ref.shape[-1]
        dt = x_ref.dtype
        copy_prec = (
            jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
        )
        q = q_ref[...].reshape(m * bn, c)
        rows = _iota2((m * bn, 1), 0) % bn
        ly = rows // a1  # local query-y within the block (0..r-1)
        lx = rows % a1  # query-x
        f32 = jnp.float32
        full_y = jax.lax.dot_general(
            q, yk_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)  # (m*bn, r*p0)
        mask_y = ly == _iota2((m * bn, rp0), 1) // p0
        ky = (_iota2((rp0, p0), 0) % p0 == _iota2((rp0, p0), 1)).astype(dt)
        term_y = jax.lax.dot_general(
            jnp.where(mask_y, full_y, jnp.zeros((), dt)), ky,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=copy_prec,
        ).astype(dt)  # (m*bn, p0)
        full_x = jax.lax.dot_general(
            q, xr_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)  # (m*bn, a1*p1)
        mask_x = lx == _iota2((m * bn, xp), 1) // p1
        kx = (_iota2((xp, p1), 0) % p1 == _iota2((xp, p1), 1)).astype(dt)
        term_x = jax.lax.dot_general(
            jnp.where(mask_x, full_x, jnp.zeros((), dt)), kx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=copy_prec,
        ).astype(dt)  # (m*bn, p1)
        ey = (_iota2((p0, np_), 0) == _iota2((p0, np_), 1) // p1).astype(dt)
        ex = (_iota2((p1, np_), 0) == _iota2((p1, np_), 1) % p1).astype(dt)
        t = jax.lax.dot_general(
            term_y, ey, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=copy_prec,
        ).astype(dt) + jax.lax.dot_general(
            term_x, ex, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=copy_prec,
        ).astype(dt)
        out_ref[...] = x_ref[...] + t.reshape(m, bn, np_)

    return kernel


def _row_block(a0, a1, cap=512):
    """Largest tile-legal row block, falling back to whole-axis blocks
    (always legal: the block then equals the array dim, and the full
    per-axis tables are only a few hundred KB). See common.row_block."""
    return _common_row_block(a0, a1, cap, fallback=a0)


@partial(jax.jit, static_argnames=("a", "p", "interpret"))
def relpos_bias_add_v2(x, q, y_rel, x_rel, *, a, p, interpret=False):
    """x (B, H, N, Np) attention logits; q (B, H, N, c); y_rel (a0, p0, c);
    x_rel (a1, p1, c). Returns x + decomposed relative-position bias.
    See the v2 design note above."""
    bsz, heads, n, np_ = x.shape
    a0, a1 = a
    p0, p1 = p
    c = q.shape[-1]
    assert n == a0 * a1 and np_ == p0 * p1, (x.shape, a, p)
    dtype = x.dtype
    bh = bsz * heads
    r = _row_block(a0, a1)
    bn = r * a1
    # head-chunk size: keep the f32 full_y/full_x intermediates and the x
    # slab small
    slab = bn * max(np_ * x.dtype.itemsize, a1 * p1 * 4, r * p0 * 4)
    m = max(1, (2 * 2**20) // max(slab, 1))
    m = min(m, bh)
    while bh % m:
        m -= 1
    x3 = x.reshape(bh, n, np_)
    q3 = q.reshape(bh, n, c)
    y_flat = y_rel.reshape(a0 * p0, c).astype(dtype)
    x_flat = x_rel.reshape(a1 * p1, c).astype(dtype)
    grid = (bh // m, a0 // r)
    out = pl.pallas_call(
        _make_kernel_v2(m, bn, r, a1, p0, p1, np_),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, bn, np_), lambda i, j: (i, j, 0)),
                pl.BlockSpec((m, bn, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((r * p0, c), lambda i, j: (j, 0)),
                pl.BlockSpec((a1 * p1, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, bn, np_), lambda i, j: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n, np_), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, q3, y_flat, x_flat)
    return out.reshape(bsz, heads, n, np_)
