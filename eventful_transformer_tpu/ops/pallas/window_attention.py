"""Fused windowed multi-head attention with in-kernel rel-pos bias.

ViTDet's windowed blocks (reference blocks.py:262-287 window partition +
205-246 attention) dominate the backbone: 8 of 12 blocks at both 672 and
1024. The XLA lowering pays, per block per frame, (1) the (B, N, 3C) ->
(B, H, N, d) head-split/merge transposes, (2) three HBM round-trips of the
(Bw, H, T, T) logits (matmul-1 write, bias+softmax read/write, matmul-2
read), and (3) the decomposed rel-pos term matmuls in HBM — together the
largest profiled cost category at 672 (docs/PERF_NOTES.md round 3).

This kernel computes attention for one WINDOW per grid instance entirely in
VMEM: the packed (T, 3C) qkv rows are read once, heads are sliced at static
lane offsets (never materialized in HBM), the decomposed rel-pos bias is
contracted in-kernel from the same flat-expander formulation as
core/embeddings.py (exact 0/1 collapse/expand matmuls), softmax runs in
f32, and only the (T, C) output is written. Window size is static (14x14
at every ViTDet operating point), so T = 196 and all shapes are compile
time constants.

Semantics match Block._forward_attention for the windowed/no-pool/no-ATS
case (reference blocks.py:205-246 + utils.py:139-171): logits = (q/scale)
@ k^T + bias(q) with UNSCALED q in the bias terms, softmax over keys, A@V
in the input dtype. Parity-tested against the XLA path in
tests/test_pallas.py; FLOP counts are added by the caller (blocks.py) with
the XLA path's exact keys/formulas.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _make_kernel(heads, head_dim, inv_scale, with_bias, a0, a1, p0, p1):
    t = a0 * a1 if with_bias else None

    def kernel(*refs):
        if with_bias:
            x_ref, yk_ref, xr_ref, out_ref = refs
        else:
            x_ref, out_ref = refs
        x = x_ref[0]  # (T, 3C)
        c = heads * head_dim
        n = x.shape[0]
        if with_bias:
            # Head-independent bias operands, hoisted out of the head loop.
            # mask_*: block-diagonal selectors of the q @ table^T products;
            # k*/e*: exact single-nonzero collapse/expand matrices (see
            # core/embeddings.py::_precompute_flat).
            np_ = p0 * p1
            rows = _iota2((n, 1), 0)
            ly, lx = rows // a1, rows % a1
            mask_y = ly == _iota2((n, a0 * p0), 1) // p0
            mask_x = lx == _iota2((n, a1 * p1), 1) // p1
            ky = (_iota2((a0 * p0, p0), 0) % p0 == _iota2((a0 * p0, p0), 1))
            kx = (_iota2((a1 * p1, p1), 0) % p1 == _iota2((a1 * p1, p1), 1))
            ey = _iota2((p0, np_), 0) == _iota2((p0, np_), 1) // p1
            ex = _iota2((p1, np_), 0) == _iota2((p1, np_), 1) % p1
            ky, kx = ky.astype(jnp.float32), kx.astype(jnp.float32)
            ey, ex = ey.astype(jnp.float32), ex.astype(jnp.float32)
            yk = yk_ref[...].astype(jnp.float32)  # (a0*p0, c)
            xr = xr_ref[...].astype(jnp.float32)  # (a1*p1, c)
        outs = []
        for h in range(heads):
            q = x[:, h * head_dim:(h + 1) * head_dim].astype(jnp.float32)
            k = x[:, c + h * head_dim:c + (h + 1) * head_dim].astype(jnp.float32)
            v = x[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            logits = _dot(q * jnp.float32(inv_scale), k, trans_b=True)  # (T, T)
            if with_bias:
                term_y = _dot(jnp.where(mask_y, _dot(q, yk, trans_b=True), 0.0), ky)
                term_x = _dot(jnp.where(mask_x, _dot(q, xr, trans_b=True), 0.0), kx)
                logits = logits + _dot(term_y, ey) + _dot(term_x, ex)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            outs.append(_dot(attn, v).astype(out_ref.dtype))
        out_ref[0] = jnp.concatenate(outs, axis=-1)

    return kernel


@partial(
    jax.jit,
    static_argnames=("heads", "scale", "a", "p", "interpret"),
)
def window_attention(
    qkv, y_rel=None, x_rel=None, *, heads, scale, a=None, p=None,
    interpret=False,
):
    """qkv (Bw, T, 3C) packed per-window rows in the QKV domain -> attention
    output (Bw, T, C). Optional decomposed rel-pos bias from y_rel
    (a0, p0, c) / x_rel (a1, p1, c) with a = (a0, a1) the window query grid
    and p the key grid (== a: windowed blocks never pool)."""
    bw, t, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    with_bias = y_rel is not None
    if with_bias:
        a0, a1 = a
        p0, p1 = p if p is not None else a
        assert t == a0 * a1 and t == p0 * p1, (t, a, p)
        args = [
            qkv,
            y_rel.reshape(a0 * p0, head_dim).astype(qkv.dtype),
            x_rel.reshape(a1 * p1, head_dim).astype(qkv.dtype),
        ]
        in_specs = [
            pl.BlockSpec((1, t, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((a0 * p0, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((a1 * p1, head_dim), lambda i: (0, 0)),
        ]
    else:
        a0 = a1 = p0 = p1 = 0
        args = [qkv]
        in_specs = [pl.BlockSpec((1, t, c3), lambda i: (i, 0, 0))]
    return pl.pallas_call(
        _make_kernel(heads, head_dim, 1.0 / scale, with_bias, a0, a1, p0, p1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bw,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bw, t, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)
