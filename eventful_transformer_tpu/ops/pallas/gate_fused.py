"""Fused gate-group Pallas kernels.

The token gate's steady-state cost is pure HBM traffic: LN -> error norms ->
(top-k in XLA) -> reference-state select -> (recompute) op matmul. These
kernels collapse the passes:

  * ln_norms:          norms = ||ln(x) - p||        (one read of x and p)
  * ln_select_matmul:  p' = where(cov, ln(x), p);  y = p' @ W + b
                       (one read of x and p; the op matmul consumes p'
                        in VMEM, never re-reading it from HBM)

Unlike the scatter-blend experiment (docs/PERF_NOTES.md), each kernel
subsumes its ENTIRE XLA fusion group, so no consumer fusion is broken.
Numerics: LN in f32 (same as core.nn.layer_norm), matmul accumulates f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventful_transformer_tpu.ops.pallas.common import (  # noqa: F401
    LN_EPS,
    ln_f32 as _ln_f32,
)


def _ln_norms_kernel(x_ref, p_ref, scale_ref, bias_ref, out_ref):
    xl = _ln_f32(x_ref[0], scale_ref[0].astype(jnp.float32), bias_ref[0].astype(jnp.float32))
    e = xl - p_ref[0].astype(jnp.float32)
    out_ref[0, 0] = jnp.sqrt(jnp.sum(e * e, axis=-1))


@partial(jax.jit, static_argnames=("block_n", "interpret"))
def ln_norms(x, p, scale, bias, block_n=256, interpret=False):
    """||ln(x) - p|| per token. x, p (B, N, C); returns norms (B, N) f32."""
    b, n, c = x.shape
    block_n = min(block_n, n)
    grid = (b, pl.cdiv(n, block_n))
    out = pl.pallas_call(
        _ln_norms_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, p, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:, 0]


def _make_select_matmul_kernel(ln_mode):
    """ln_mode: "post" (gate after LN: select ln(x) into p, op input = p'),
    "pre" (gate before LN: select x into p, op input = ln(p')),
    "none" (no LN anywhere: select x into p, op input = p')."""

    def kernel(x_ref, p_ref, cov_ref, scale_ref, bias_ref, w_ref, wb_ref, p_out, y_out):
        scale = scale_ref[0].astype(jnp.float32)
        bias = bias_ref[0].astype(jnp.float32)
        cov = cov_ref[0, 0][:, None] > 0
        if ln_mode == "post":
            xl = _ln_f32(x_ref[0], scale, bias)
            p_new = jnp.where(cov, xl, p_ref[0].astype(jnp.float32))
            mm_in = p_new
        elif ln_mode == "pre":
            p_new = jnp.where(cov, x_ref[0].astype(jnp.float32), p_ref[0].astype(jnp.float32))
            mm_in = _ln_f32(p_new, scale, bias)
        else:  # "none"
            p_new = jnp.where(cov, x_ref[0].astype(jnp.float32), p_ref[0].astype(jnp.float32))
            mm_in = p_new
        p_out[0] = p_new.astype(p_out.dtype)
        y = jax.lax.dot_general(
            mm_in.astype(w_ref.dtype),
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + wb_ref[0].astype(jnp.float32)
        y_out[0] = y.astype(y_out.dtype)

    return kernel


@partial(jax.jit, static_argnames=("ln_mode", "block_n", "interpret"))
def ln_select_matmul(
    x, p, cov, scale, bias, w, wb, ln_mode="post", block_n=256, interpret=False
):
    """Fused gate-state update + op recompute.

    x, p (B, N, C); cov (B, N) (>0 where selected); w (C, F), wb (F,).
    Returns (p_new (B, N, C), y (B, N, F)); see _make_select_matmul_kernel
    for the ln_mode semantics."""
    b, n, c = x.shape
    f = w.shape[-1]
    block_n = min(block_n, n)
    grid = (b, pl.cdiv(n, block_n))
    kernel = _make_select_matmul_kernel(ln_mode)
    p_new, y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((c, f), lambda i, j: (0, 0)),
                pl.BlockSpec((1, f), lambda i, j: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, block_n, f), lambda i, j: (i, j, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), p.dtype),
            jax.ShapeDtypeStruct((b, n, f), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        # In-place state update (see gate_group.py): p' overwrites p so
        # the frame scan's loop carry needs no per-iteration copy.
        input_output_aliases={1: 0},
        interpret=interpret,
    )(
        x,
        p,
        cov.reshape(b, 1, n).astype(jnp.float32),
        scale.reshape(1, -1),
        bias.reshape(1, -1),
        w,
        wb.reshape(1, -1),
    )
    return p_new, y


def _make_select_linear_skip_norms_kernel(next_ln):
    def kernel(
        x_ref, p_ref, cov_ref, skip_ref, pn_ref, scale_ref, bias_ref,
        w_ref, wb_ref, p_out, y_out, n_out,
    ):
        cov = cov_ref[0, 0][:, None] > 0
        # Gate domain = input domain (the projection gate, ln_mode "none").
        p_new = jnp.where(
            cov, x_ref[0].astype(jnp.float32), p_ref[0].astype(jnp.float32)
        )
        p_out[0] = p_new.astype(p_out.dtype)
        y = jax.lax.dot_general(
            p_new.astype(w_ref.dtype), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + wb_ref[0].astype(jnp.float32)
        # Round to the working dtype BEFORE the skip-add, exactly like the
        # unfused Linear.apply -> counted_add sequence.
        y = y.astype(y_out.dtype) + skip_ref[0]
        y_out[0] = y
        if next_ln:
            yn = _ln_f32(
                y, scale_ref[0].astype(jnp.float32), bias_ref[0].astype(jnp.float32)
            )
        else:
            yn = y.astype(jnp.float32)
        e = yn - pn_ref[0].astype(jnp.float32)
        n_out[0, 0] = jnp.sqrt(jnp.sum(e * e, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("next_ln", "block_n", "interpret"))
def select_linear_skip_norms(
    x, p, cov, w, wb, skip, p_next, scale, bias, next_ln=True, block_n=256,
    interpret=False,
):
    """Whole projection-group pass fused with the NEXT gate's error norms:

        p'    = where(cov, x, p)            (input-domain gate-state select)
        y     = p' @ w + wb + skip          (op recompute + fused residual)
        norms = ||ln(y) - p_next||          (the next gate's selection norms;
                                             ``next_ln=False`` skips the LN
                                             for gate_before_ln stacks)

    One read of x, p, skip, p_next and one write of p', y replace the five
    separate XLA passes of the unfused chain (norms / select / matmul / add /
    next-norms). Row-local throughout, so the grid blocks freely over N.
    Returns (p', y, norms (B, N) f32).
    """
    b, n, c = x.shape
    f = w.shape[-1]
    block_n = min(block_n, n)
    grid = (b, pl.cdiv(n, block_n))
    row = lambda i, j: (i, j, 0)
    vec = lambda i, j: (0, 0)
    p_new, y, norms = pl.pallas_call(
        _make_select_linear_skip_norms_kernel(next_ln),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, c), row),
                pl.BlockSpec((1, block_n, c), row),
                pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, block_n, f), row),
                pl.BlockSpec((1, block_n, f), row),
                pl.BlockSpec((1, f), vec),
                pl.BlockSpec((1, f), vec),
                pl.BlockSpec((c, f), vec),
                pl.BlockSpec((1, f), vec),
            ],
            out_specs=(
                pl.BlockSpec((1, block_n, c), row),
                pl.BlockSpec((1, block_n, f), row),
                pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), p.dtype),
            jax.ShapeDtypeStruct((b, n, f), x.dtype),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        # In-place state update (see gate_group.py).
        input_output_aliases={1: 0},
        interpret=interpret,
    )(
        x,
        p,
        cov.reshape(b, 1, n).astype(jnp.float32),
        skip,
        p_next,
        scale.reshape(1, -1),
        bias.reshape(1, -1),
        w,
        wb.reshape(1, -1),
    )
    return p_new, y, norms[:, 0]


def _make_select_kernel(apply_ln):
    def kernel(x_ref, p_ref, cov_ref, scale_ref, bias_ref, p_out):
        cov = cov_ref[0, 0][:, None] > 0
        if apply_ln:
            xl = _ln_f32(
                x_ref[0],
                scale_ref[0].astype(jnp.float32),
                bias_ref[0].astype(jnp.float32),
            )
        else:
            xl = x_ref[0].astype(jnp.float32)
        p_out[0] = jnp.where(cov, xl, p_ref[0].astype(jnp.float32)).astype(p_out.dtype)

    return kernel


@partial(jax.jit, static_argnames=("apply_ln", "block_n", "interpret"))
def ln_select(x, p, cov, scale, bias, apply_ln=True, block_n=256, interpret=False):
    """Gate-state update only: p' = where(cov, ln(x) if apply_ln else x, p)."""
    b, n, c = x.shape
    block_n = min(block_n, n)
    grid = (b, pl.cdiv(n, block_n))
    return pl.pallas_call(
        _make_select_kernel(apply_ln),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        # In-place state update (see gate_group.py).
        input_output_aliases={1: 0},
        interpret=interpret,
    )(x, p, cov.reshape(b, 1, n).astype(jnp.float32), scale.reshape(1, -1), bias.reshape(1, -1))
