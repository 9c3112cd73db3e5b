"""Fused (rel-pos bias ->) softmax -> stale-column select -> A·V matmul.

With ``recompute_av`` (core/blocks.py) the eventful A·V product is
``p_a' @ p_v'`` where ``p_a' = where(cov, softmax(logits), p_a)`` keeps
stale columns for unselected v-tokens (reference modules.py:255-299 fixed
point). XLA lowers that chain as [softmax fusion] -> materialize a ->
[divide+select fusion] -> materialize p_a' -> [matmul], reading and writing
the (B, H, N, Np) attention matrix several times — at ViTDet-1024 the
matrix is 200 MB in bf16 and the chain measured ~5.7 ms/frame (profiled,
docs/PERF_NOTES.md round 3).

This kernel does the whole chain in ONE pass at the traffic floor: read
logits and p_a once, write p_a' once, accumulate the (row-block, d) output
in VMEM — the softmax activations never exist in HBM. Softmax is computed
in f32 (max-subtracted, as jax.nn.softmax) and rounded to the state dtype;
the matmuls run with working-dtype inputs and f32 MXU accumulation — the
same trajectory as the XLA paths they replace. (A round-5 profile caught
the original formulation upcasting q/k to f32 before matmul-1: f32xf32
dots run ~6 MXU passes, and the kernel measured 1.46 ms/block-frame
against a ~0.2 ms traffic+FLOP floor at ViTDet-1024.)

Rel-pos bias: the caller precomputes the decomposed per-axis TERMS
``(B, H, N, p0 + p1)`` in XLA (RelativePositionEmbedding.bias_terms — two
thin einsums over q, ~0.8 GFLOP at ViTDet-1024) and the kernel expands
them onto the (row-block, Np) logits with one exact 0/1 expander matmul
built from iotas in VMEM (single-nonzero-per-output MXU row sums:
``bias[n, kp] = term_y[n, kp // p1] + term_x[n, kp % p1]``). The previous
formulation contracted q against the full per-axis TABLES in-kernel
(~50 GFLOP/block-frame of mask/collapse machinery at ViTDet-1024, ~4x the
cost of matmul-1 itself) and constrained the row block to whole query
rows; with precomputed terms any row block is legal, so the fused path no
longer needs a tile-legality fallback. This is also the right fusion home
for the bias: a STANDALONE bias kernel only adds an HBM materialization
boundary (measured: dense-1024 44.7 -> 48.5 ms/frame), whereas here the
logits already stop at this kernel.

Fused matmul-1 (``k`` + ``inv_scale``): the logits are computed in-kernel
as ``(q * inv_scale) @ k^T`` per row block — the (B, H, N, Np) logits
never exist in HBM (~400 MB of pure traffic per global block-frame at
ViTDet-1024).

Semantics: exactly ``select_cols(p_a, softmax(logits + bias), index,
mask)`` and the subsequent matmul (parity-tested in tests/test_pallas.py).
The grid blocks over (batch*heads, N); cov broadcasts per batch element
across heads and rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from eventful_transformer_tpu.ops.pallas.common import (
    iota2 as _iota2,
)


def _expander(p0, p1, np_, dtype):
    """(p0 + p1, Np) exact 0/1 bias expander: row r < p0 hits the key
    columns with kp // p1 == r (y term), row p0 + r hits kp % p1 == r
    (x term). Each output element of term @ expander sums exactly one y
    and one x value, so the matmul is exact at any dtype."""
    rows = _iota2((p0 + p1, np_), 0)
    cols = _iota2((p0 + p1, np_), 1)
    # The two patterns are disjoint by construction — cols // p1 <= p0 - 1
    # never matches a row >= p0, and rows - p0 < 0 never matches a
    # non-negative cols % p1 — so a sum of indicators is an exact 0/1
    # matrix (and avoids vector-i1 select, which Mosaic cannot lower).
    e_y = (cols // p1 == rows).astype(dtype)
    e_x = (cols % p1 == rows - p0).astype(dtype)
    return e_y + e_x


def _make_kernel(with_bias, p0, p1, np_, inv_scale=None):
    fuse_mm1 = inv_scale is not None

    def kernel(*refs):
        if fuse_mm1:
            if with_bias:
                p_ref, cov_ref, v_ref, q_ref, k_ref, t_ref, p_out, y_out = refs
            else:
                p_ref, cov_ref, v_ref, q_ref, k_ref, p_out, y_out = refs
            # matmul-1 in-kernel at the XLA path's precision: working-dtype
            # inputs, f32 MXU accumulation. Scaled q on the product
            # (reference blocks.py:220-223).
            qs = q_ref[0, 0] * jnp.asarray(inv_scale, q_ref.dtype)
            l32 = jax.lax.dot_general(
                qs, k_ref[0, 0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bn, Np)
        else:
            if with_bias:
                logits_ref, p_ref, cov_ref, v_ref, t_ref, p_out, y_out = refs
            else:
                logits_ref, p_ref, cov_ref, v_ref, p_out, y_out = refs
            l32 = logits_ref[0, 0].astype(jnp.float32)  # (bn, Np)
        if with_bias:
            l32 = l32 + jax.lax.dot_general(
                t_ref[0, 0], _expander(p0, p1, np_, t_ref.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = jnp.max(l32, axis=-1, keepdims=True)
        e = jnp.exp(l32 - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        covr = cov_ref[0, 0] > 0  # (Np,)
        p_new = jnp.where(covr[None, :], a.astype(p_ref.dtype), p_ref[0, 0])
        p_out[0, 0] = p_new
        y_out[0, 0] = jax.lax.dot_general(
            p_new, v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y_out.dtype)

    return kernel


@partial(jax.jit, static_argnames=("p", "block_n", "inv_scale", "interpret"))
def softmax_select_matmul(
    logits, p_a, cov, p_v, q=None, k=None, terms=None, *,
    p=None, block_n=512, inv_scale=None, interpret=False,
):
    """logits (B, H, N, Np) pre-softmax attention logits; p_a (B, H, N, Np)
    stale attention state; cov (B, Np) column selection coverage (>0 =
    refresh); p_v (B, H, Np, d) updated value state.

    Optional fused rel-pos bias: ``terms`` (B, H, N, p0 + p1) decomposed
    per-axis bias terms (RelativePositionEmbedding.bias_terms) with
    ``p = (p0, p1)`` the pooled key grid; the kernel expands them onto the
    key axis with an exact 0/1 matmul in VMEM.

    Fused matmul-1: pass ``k`` (B, H, Np, c) + ``inv_scale`` (and ``q``,
    with ``logits=None``) and the kernel computes
    ``logits = (q * inv_scale) @ k^T`` per row block — the full logits
    tensor never exists in HBM.

    Returns (p_a', out) with p_a' = where(cov, softmax(logits + bias), p_a)
    and out = p_a' @ p_v.
    """
    fuse_mm1 = k is not None
    b, h, n, np_ = (q.shape[:3] + (p_a.shape[-1],)) if fuse_mm1 else logits.shape
    d = p_v.shape[-1]
    with_bias = terms is not None
    if with_bias:
        p0, p1 = p
        assert terms.shape[-1] == p0 + p1, (terms.shape, p)
    else:
        p0 = p1 = 0
    bn = min(block_n, n)
    grid = (b * h, pl.cdiv(n, bn))
    row = lambda i, j: (i // h, i % h, j, 0)
    in_specs = [
        pl.BlockSpec((1, 1, bn, np_), row),
        pl.BlockSpec((1, 1, np_), lambda i, j: (i // h, 0, 0)),
        pl.BlockSpec((1, 1, np_, d), lambda i, j: (i // h, i % h, 0, 0)),
    ]
    args = [p_a, cov.reshape(b, 1, np_).astype(jnp.float32), p_v]
    if not fuse_mm1:
        in_specs.insert(0, pl.BlockSpec((1, 1, bn, np_), row))
        args.insert(0, logits)
    else:
        c = q.shape[-1]
        in_specs += [
            pl.BlockSpec((1, 1, bn, c), row),
            pl.BlockSpec((1, 1, np_, c), lambda i, j: (i // h, i % h, 0, 0)),
        ]
        args += [q, k]
    if with_bias:
        in_specs.append(pl.BlockSpec((1, 1, bn, p0 + p1), row))
        args.append(terms)
    outs = pl.pallas_call(
        _make_kernel(with_bias, p0, p1, np_,
                     inv_scale=inv_scale if fuse_mm1 else None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, bn, np_), row),
                pl.BlockSpec((1, 1, bn, d), row),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, np_), p_a.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), p_a.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        # In-place attention-state update: p_a' overwrites p_a (the (B, H,
        # N, Np) array is the largest state leaf — 18.7 MB at ViTDet-1024)
        # so the frame scan's loop carry needs no per-iteration copy. Each
        # grid instance reads exactly the row block it writes.
        input_output_aliases={(0 if fuse_mm1 else 1): 0},
        interpret=interpret,
    )(*args)
    return outs
