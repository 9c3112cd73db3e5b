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
