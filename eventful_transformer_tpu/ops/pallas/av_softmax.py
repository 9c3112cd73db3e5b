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
the matmul accumulates f32 on the MXU.

When ``q`` and the decomposed rel-pos tables are passed, the bias is also
computed in-kernel and added to the logits before the softmax — the right
fusion home for the bias: a STANDALONE bias kernel only adds an HBM
materialization boundary (measured: dense-1024 44.7 -> 48.5 ms/frame,
because XLA fuses the plain bias ADD into the softmax pass anyway), whereas
here the logits already stop at this kernel. The bias math follows the
flat-expander formulation (core/embeddings.py): the row block covers whole
query rows, so each grid instance contracts q against its OWN y-table slice
and the shared x table, then exact 0/1 mask/collapse/expand matmuls built
from iotas assemble the (bn, Np) bias without it ever leaving VMEM.

Semantics: exactly ``select_cols(p_a, softmax(rel(logits)), index, mask)``
and the subsequent matmul (parity-tested in tests/test_pallas.py). The grid
blocks over (batch*heads, N); cov broadcasts per batch element across heads
and rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from eventful_transformer_tpu.ops.pallas.common import (
    iota2 as _iota2,
    row_block as _row_block,
)


def _bias_block(q, yk, xr, r, a1, p0, p1, np_):
    """Decomposed rel-pos bias for a block of r whole query rows: q (bn, c),
    yk (r*p0, c) this block's y-table slice, xr (a1*p1, c). Returns (bn, Np)
    f32. All matmuls f32-accumulated; the mask/collapse/expand matmuls are
    exact single-nonzero copies."""
    bn = r * a1
    rp0, xp = r * p0, a1 * p1
    f32 = jnp.float32
    rows = _iota2((bn, 1), 0)
    ly = rows // a1
    lx = rows % a1
    full_y = jax.lax.dot_general(
        q, yk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (bn, r*p0)
    mask_y = ly == _iota2((bn, rp0), 1) // p0
    ky = (_iota2((rp0, p0), 0) % p0 == _iota2((rp0, p0), 1)).astype(f32)
    term_y = jax.lax.dot_general(
        jnp.where(mask_y, full_y, 0.0), ky,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (bn, p0)
    full_x = jax.lax.dot_general(
        q, xr, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (bn, a1*p1)
    mask_x = lx == _iota2((bn, xp), 1) // p1
    kx = (_iota2((xp, p1), 0) % p1 == _iota2((xp, p1), 1)).astype(f32)
    term_x = jax.lax.dot_general(
        jnp.where(mask_x, full_x, 0.0), kx,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (bn, p1)
    ey = (_iota2((p0, np_), 0) == _iota2((p0, np_), 1) // p1).astype(f32)
    ex = (_iota2((p1, np_), 0) == _iota2((p1, np_), 1) % p1).astype(f32)
    return jax.lax.dot_general(
        term_y, ey, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        term_x, ex, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )


def _make_kernel(with_bias, r, a1, p0, p1, np_, inv_scale=None):
    fuse_mm1 = inv_scale is not None

    def kernel(*refs):
        if fuse_mm1:
            if with_bias:
                (p_ref, cov_ref, v_ref, q_ref, k_ref, yk_ref, xr_ref,
                 p_out, y_out) = refs
            else:
                p_ref, cov_ref, v_ref, q_ref, k_ref, p_out, y_out = refs
            # matmul-1 in-kernel: the (B, H, N, Np) logits never exist in
            # HBM (200 MB bf16 at ViTDet-1024, written by XLA matmul-1 and
            # re-read here — ~2 ms/frame of pure traffic). Scaled q on the
            # product only; the rel-pos bias uses UNSCALED q (reference
            # blocks.py:220-223 + utils.py:139-171).
            l32 = jax.lax.dot_general(
                q_ref[0, 0].astype(jnp.float32) * jnp.float32(inv_scale),
                k_ref[0, 0].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bn, Np)
        else:
            if with_bias:
                (logits_ref, p_ref, cov_ref, v_ref, q_ref, yk_ref, xr_ref,
                 p_out, y_out) = refs
            else:
                logits_ref, p_ref, cov_ref, v_ref, p_out, y_out = refs
            l32 = logits_ref[0, 0].astype(jnp.float32)  # (bn, Np)
        if with_bias:
            l32 = l32 + _bias_block(
                q_ref[0, 0], yk_ref[...], xr_ref[...], r, a1, p0, p1, np_
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


def row_block(a0, a1, cap=512):
    """Largest tile-legal bias row block; 0 if none exists (caller falls
    back to XLA bias on materialized logits). See common.row_block."""
    return _row_block(a0, a1, cap, fallback=0)


@partial(jax.jit, static_argnames=("a", "p", "block_n", "inv_scale", "interpret"))
def softmax_select_matmul(
    logits, p_a, cov, p_v, q=None, y_rel=None, x_rel=None, k=None, *,
    a=None, p=None, block_n=512, inv_scale=None, interpret=False,
):
    """logits (B, H, N, Np) pre-softmax attention logits; p_a (B, H, N, Np)
    stale attention state; cov (B, Np) column selection coverage (>0 =
    refresh); p_v (B, H, Np, d) updated value state. Optional fused rel-pos
    bias: q (B, H, N, c), y_rel (a0, p0, c), x_rel (a1, p1, c) with
    a = (a0, a1) query grid, p = (p0, p1) pooled key grid.

    Fused matmul-1: pass ``k`` (B, H, Np, c) + ``inv_scale`` (and ``q``,
    with ``logits=None``) and the kernel computes
    ``logits = (q * inv_scale) @ k^T`` per row block in f32 — the full
    logits tensor never exists in HBM.

    Returns (p_a', out) with p_a' = where(cov, softmax(logits + bias), p_a)
    and out = p_a' @ p_v.
    """
    fuse_mm1 = k is not None
    b, h, n, np_ = (q.shape[:3] + (p_a.shape[-1],)) if fuse_mm1 else logits.shape
    ldtype = q.dtype if fuse_mm1 else logits.dtype
    d = p_v.shape[-1]
    with_bias = y_rel is not None
    if with_bias:
        a0, a1 = a
        p0, p1 = p
        r = row_block(a0, a1, block_n)
        assert r, (a, "no tile-legal row block; compute the bias in XLA")
        bn = r * a1
    else:
        r = a1 = p0 = p1 = 0
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
    if fuse_mm1 or with_bias:
        c = q.shape[-1]
        in_specs.append(pl.BlockSpec((1, 1, bn, c), row))
        args.append(q)
    if fuse_mm1:
        c = q.shape[-1]
        in_specs.append(
            pl.BlockSpec((1, 1, np_, c), lambda i, j: (i // h, i % h, 0, 0))
        )
        args.append(k)
    if with_bias:
        c = q.shape[-1]
        in_specs += [
            pl.BlockSpec((r * p0, c), lambda i, j: (j, 0)),
            pl.BlockSpec((a1 * p1, c), lambda i, j: (0, 0)),
        ]
        args += [
            y_rel.reshape(a0 * p0, c).astype(ldtype),
            x_rel.reshape(a1 * p1, c).astype(ldtype),
        ]
    outs = pl.pallas_call(
        _make_kernel(with_bias, r, a1, p0, p1, np_,
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
