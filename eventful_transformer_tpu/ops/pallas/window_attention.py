"""Fused windowed multi-head attention with precomputed rel-pos bias terms.

ViTDet's windowed blocks (reference blocks.py:262-287 window partition +
205-246 attention) dominate the backbone: 8 of 12 blocks at both 672 and
1024. The XLA lowering pays, per block per frame, (1) the (B, N, 3C) ->
(B, H, N, d) head-split/merge transposes, (2) three HBM round-trips of the
(Bw, H, T, T) logits (matmul-1 write, bias+softmax read/write, matmul-2
read), and (3) the decomposed rel-pos term matmuls in HBM — together the
largest profiled cost category at 672 (docs/PERF_NOTES.md round 3).

This kernel computes attention for one WINDOW per grid instance entirely in
VMEM: the packed (T, 3C) qkv rows are read once, heads are sliced at static
lane offsets (never materialized in HBM), softmax runs in f32, and only
the (T, C) output is written. Window size is static (14x14 at every ViTDet
operating point), so T = 196 and all shapes are compile time constants.

Rel-pos bias: the caller precomputes the decomposed per-axis TERMS
(:func:`window_bias_terms` — thin XLA einsums reading the q lanes of the
packed qkv through a FREE per-head reshape) and the kernel expands them
onto the (T, T) logits with one exact 0/1 iota-built matmul per head
(``bias[n, m] = term_y[n, m // a1] + term_x[n, m % a1]``). The original
formulation contracted q against the full per-axis tables in-kernel —
~12M f32 MACs per head per window at the 14x14 ViTDet window, ~3x the
attention matmuls themselves — and together with f32 q/k upcasts (f32xf32
dots run ~6 MXU passes) measured 177 us/invocation at 672 against a
~10 us floor. Matmuls now run with working-dtype inputs and f32 MXU
accumulation, the exact trajectory of the XLA path.

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


from eventful_transformer_tpu.ops.pallas.common import iota2 as _iota2


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _bias_operands(n, a0, a1, p0, p1):
    """Head-independent rel-pos bias operands (built from iotas in VMEM).
    mask_*: block-diagonal selectors of the q @ table^T products; k*/e*:
    exact single-nonzero collapse/expand matrices (see
    core/embeddings.py::_precompute_flat)."""
    np_ = p0 * p1
    rows = _iota2((n, 1), 0)
    ly, lx = rows // a1, rows % a1
    mask_y = ly == _iota2((n, a0 * p0), 1) // p0
    mask_x = lx == _iota2((n, a1 * p1), 1) // p1
    ky = (_iota2((a0 * p0, p0), 0) % p0 == _iota2((a0 * p0, p0), 1))
    kx = (_iota2((a1 * p1, p1), 0) % p1 == _iota2((a1 * p1, p1), 1))
    ey = _iota2((p0, np_), 0) == _iota2((p0, np_), 1) // p1
    ex = _iota2((p1, np_), 0) == _iota2((p1, np_), 1) % p1
    return (
        mask_y, mask_x,
        ky.astype(jnp.float32), kx.astype(jnp.float32),
        ey.astype(jnp.float32), ex.astype(jnp.float32),
    )


def _attend(x, heads, head_dim, inv_scale, bias_ops, yk, xr, out_dtype):
    """One window's attention: x (T, 3C) packed qkv rows -> (T, C)."""
    c = heads * head_dim
    outs = []
    for h in range(heads):
        q = x[:, h * head_dim:(h + 1) * head_dim].astype(jnp.float32)
        k = x[:, c + h * head_dim:c + (h + 1) * head_dim].astype(jnp.float32)
        v = x[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
        logits = _dot(q * jnp.float32(inv_scale), k, trans_b=True)  # (T, T)
        if bias_ops is not None:
            mask_y, mask_x, ky, kx, ey, ex = bias_ops
            term_y = _dot(jnp.where(mask_y, _dot(q, yk, trans_b=True), 0.0), ky)
            term_x = _dot(jnp.where(mask_x, _dot(q, xr, trans_b=True), 0.0), kx)
            logits = logits + _dot(term_y, ey) + _dot(term_x, ex)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(_dot(attn, v).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _expander(p0, p1, np_, dtype):
    """(p0 + p1, Np) exact 0/1 bias expander (same construction as
    ops/pallas/av_softmax._expander): row r < p0 hits key columns with
    kp // p1 == r, row p0 + r hits kp % p1 == r. The two patterns are
    disjoint, so a sum of indicators is exact 0/1 (and avoids vector-i1
    select, which Mosaic cannot lower)."""
    rows = _iota2((p0 + p1, np_), 0)
    cols = _iota2((p0 + p1, np_), 1)
    e_y = (cols // p1 == rows).astype(dtype)
    e_x = (cols % p1 == rows - p0).astype(dtype)
    return e_y + e_x


def _attend_terms(x, heads, head_dim, inv_scale, terms, pad_terms, valid,
                  out_dtype, p0, p1):
    """One window's attention with precomputed bias terms. x (T, 3C) packed
    qkv rows (pad rows already substituted); terms (H, T, p0 + p1) or None;
    pad_terms (H, T, p0 + p1) substituted at ~valid rows (pad-row outputs
    are cropped downstream, but the resident-buffer path keeps them, so the
    substitution preserves exact parity with the XLA chain). All matmuls:
    working-dtype inputs, f32 MXU accumulation."""
    c = heads * head_dim
    n = x.shape[0]
    e = _expander(p0, p1, n, x.dtype) if terms is not None else None
    outs = []
    for h in range(heads):
        q = x[:, h * head_dim:(h + 1) * head_dim]
        k = x[:, c + h * head_dim:c + (h + 1) * head_dim]
        v = x[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q * jnp.asarray(inv_scale, q.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T) f32
        if terms is not None:
            t_h = terms[h]
            if pad_terms is not None:
                t_h = jnp.where(valid, t_h, pad_terms[h])
            logits = logits + jax.lax.dot_general(
                t_h.astype(e.dtype), e,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - m)
        attn = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                attn, v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _make_kernel(heads, head_dim, inv_scale, with_bias, a0, a1, p0, p1,
                 geom=None):
    def kernel(*refs):
        if geom is not None:
            pb_ref, refs = refs[0], refs[1:]
        if with_bias:
            if geom is not None:
                x_ref, t_ref, pt_ref, out_ref = refs
            else:
                x_ref, t_ref, out_ref = refs
        else:
            x_ref, out_ref = refs
        x = x_ref[0]  # (T, 3C)
        n = x.shape[0]
        valid = None
        if geom is not None:
            # The spatial map was ZERO-padded to the window grid (a cheap
            # XLA pad, vs. the broadcast+set of a full qkv-bias map that
            # cost ~0.6 ms/frame at 1024); out-of-image tokens must equal
            # the qkv-bias row (reference blocks.py:269-287), so select it
            # in-kernel. Window position comes from the flat grid index.
            nh, nw, vh, vw = geom
            i = pl.program_id(0)
            wy = (i % (nh * nw)) // nw
            wx = i % nw
            idx = _iota2((n, 1), 0)
            r = idx // a1 + wy * a0
            c = idx % a1 + wx * a1
            valid = (r < vh) & (c < vw)
            x = jnp.where(valid, x, pb_ref[...].astype(x.dtype))
        out_ref[0] = _attend_terms(
            x, heads, head_dim, inv_scale,
            t_ref[0] if with_bias else None,
            pt_ref[...] if (with_bias and geom is not None) else None,
            valid, out_ref.dtype, p0, p1,
        )

    return kernel


def _make_grid_kernel(heads, head_dim, inv_scale, with_bias, a0, a1, p0, p1,
                      n_wx):
    """Row-stripe kernel: the block is one (wh, Wp, 3C) stripe of the padded
    spatial map; each of its n_wx windows is sliced at a static lane-dim
    offset in VMEM, attended, and written back to the same column range —
    the (B*nw, T, C) window layout never exists in HBM."""
    t = a0 * a1

    def kernel(*refs):
        if with_bias:
            x_ref, yk_ref, xr_ref, out_ref = refs
        else:
            x_ref, out_ref = refs
        stripe = x_ref[0]  # (wh, Wp, 3C)
        bias_ops = yk = xr = None
        if with_bias:
            bias_ops = _bias_operands(t, a0, a1, p0, p1)
            yk = yk_ref[...].astype(jnp.float32)
            xr = xr_ref[...].astype(jnp.float32)
        for wx in range(n_wx):
            win = stripe[:, wx * a1:(wx + 1) * a1, :].reshape(t, -1)
            out = _attend(
                win, heads, head_dim, inv_scale, bias_ops, yk, xr,
                out_ref.dtype,
            )
            out_ref[0, :, wx * a1:(wx + 1) * a1, :] = out.reshape(
                a0, a1, heads * head_dim
            )

    return kernel


def _window_tab(y_rel, x_rel, dtype):
    """Combined (t, p0 + p1, c) per-token table: tab[n] = [y_rel[n // a1],
    x_rel[n % a1]]. Loop-invariant — callers inside a frame scan should
    pass the precomputed copy from RelativePositionEmbedding.precompute
    (the repeat/tile copies measured ~1 ms/frame at ViTDet-672 when built
    per call)."""
    a1 = x_rel.shape[0]
    a0 = y_rel.shape[0]
    return jnp.concatenate(
        [
            jnp.repeat(y_rel.astype(dtype), a1, axis=0),
            jnp.tile(x_rel.astype(dtype), (a0, 1, 1)),
        ],
        axis=1,
    )


def window_bias_terms(qkv, y_rel, x_rel, heads, tab=None):
    """(Bw, H, T, p0 + p1) decomposed rel-pos bias terms for window rows,
    contracted in XLA: the q lanes of the packed qkv reshape per-head for
    FREE (head-major contiguous), the per-token table ``tab`` comes from
    RelativePositionEmbedding.precompute (or is built here for direct
    calls), and the single einsum is thin (Bw*T*H*c*(p0+p1) MACs — ~150M
    at the ViTDet-672 window shape). The kernel expands these onto the
    logits with exact 0/1 matmuls in VMEM. Uses UNSCALED q (reference
    utils.py:139-171)."""
    bw, t, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    if tab is None:
        tab = _window_tab(y_rel, x_rel, qkv.dtype)
    assert t == tab.shape[0], (qkv.shape, tab.shape)
    q = qkv[..., :c].reshape(bw, t, heads, hd)
    return jnp.einsum("bthc,tpc->bhtp", q, tab.astype(qkv.dtype))


def window_bias_pad_terms(pad_bias, y_rel, x_rel, heads, dtype, tab=None):
    """(H, T, p0 + p1) bias terms of the qkv-bias row (the value pad tokens
    take): substituted at pad rows in-kernel so pad-row outputs match the
    XLA chain exactly (they survive in the window-resident buffer).
    Loop-invariant — precomputed into the block aux (Block.precompute)."""
    c3 = pad_bias.size
    c = c3 // 3
    hd = c // heads
    qb = pad_bias.reshape(-1)[:c].reshape(heads, hd).astype(dtype)
    if tab is None:
        tab = _window_tab(y_rel, x_rel, dtype)
    return jnp.einsum("hc,tpc->htp", qb, tab.astype(dtype))


@partial(
    jax.jit,
    static_argnames=("heads", "scale", "a", "p", "geom", "interpret"),
)
def window_attention(
    qkv, terms=None, pad_bias=None, pad_terms=None, *, heads, scale, a=None,
    p=None, geom=None, interpret=False,
):
    """qkv (Bw, T, 3C) packed per-window rows in the QKV domain -> attention
    output (Bw, T, C). Optional decomposed rel-pos bias via precomputed
    ``terms`` (Bw, H, T, p0 + p1) (:func:`window_bias_terms`) with
    p = (p0, p1) the key grid (== a: windowed blocks never pool).

    Window padding: pass ``geom = (nh, nw, valid_h, valid_w)`` (the window
    grid ``a = (a0, a1)`` and the un-padded token extents) plus ``pad_bias``
    (the (3C,) qkv-bias row) when ``qkv`` was partitioned from a
    ZERO-padded spatial map — the kernel substitutes the bias row (and
    ``pad_terms``, :func:`window_bias_pad_terms`, when biased) at
    out-of-image tokens, replacing the HBM broadcast+set of a full bias
    map."""
    bw, t, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    with_bias = terms is not None
    with_pad = geom is not None
    if a is not None:
        a0, a1 = a
    else:
        a0 = a1 = 0
    pad_args, pad_specs = [], []
    if with_pad:
        pad_args = [pad_bias.reshape(1, c3).astype(qkv.dtype)]
        pad_specs = [pl.BlockSpec((1, c3), lambda i: (0, 0))]
    args = pad_args + [qkv]
    in_specs = pad_specs + [pl.BlockSpec((1, t, c3), lambda i: (i, 0, 0))]
    if with_bias:
        p0, p1 = p if p is not None else a
        assert t == p0 * p1, (t, a, p)
        assert terms.shape == (bw, heads, t, p0 + p1), (terms.shape,)
        args.append(terms)
        in_specs.append(
            pl.BlockSpec((1, heads, t, p0 + p1), lambda i: (i, 0, 0, 0))
        )
        if with_pad:
            args.append(pad_terms)
            in_specs.append(
                pl.BlockSpec((heads, t, p0 + p1), lambda i: (0, 0, 0))
            )
    else:
        p0 = p1 = 0
    return pl.pallas_call(
        _make_kernel(heads, head_dim, 1.0 / scale, with_bias, a0, a1, p0, p1,
                     geom=geom),
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


@partial(
    jax.jit,
    static_argnames=("heads", "scale", "window", "a", "p", "interpret"),
)
def window_attention_grid(
    x, y_rel=None, x_rel=None, *, heads, scale, window, a=None, p=None,
    interpret=False,
):
    """Windowed attention WITHOUT HBM window partitioning: ``x`` is the
    padded spatial qkv map (B, Hp, Wp, 3C) (Hp/Wp multiples of the window),
    returned as the (B, Hp, Wp, C) attention output in the same layout. The
    grid walks (batch, window-row) stripes; windows are sliced inside the
    kernel, so the reshape->transpose->reshape window partition (and its
    inverse) never happens in HBM.

    MEASURED NEGATIVE RESULT (kept as a tested option): at ViTDet-672
    shapes the in-VMEM strided window slices cost ~65 us/invocation more
    than the XLA partition transposes they replace (417 vs 352 us per
    block, loop-in-jit; full model 10.70 vs 10.17 ms/frame eventful). The
    {2,0,1}-layout copies HLO attributes to the gate-kernel call site are
    the partition transposes themselves surfacing as layout conversions on
    the pallas output — work the XLA path does anyway, not removable
    overhead. A per-window BlockSpec DMA variant (grid (B, nh, nw), block
    (1, wh, ww, 3C)) does not lower: Pallas TPU requires the last-two
    block dims divisible by (8, 128) or full, and wh=14 of 42 is neither.
    ``Block`` therefore uses :func:`window_attention` over the XLA
    partition. Semantics identical to ``window_attention`` over the
    equivalent partition (reference blocks.py:262-287 + 205-246)."""
    b, hp, wp, c3 = x.shape
    c = c3 // 3
    head_dim = c // heads
    with_bias = y_rel is not None
    if with_bias:
        a0, a1 = a
        p0, p1 = p if p is not None else a
    else:
        a0, a1 = window
        p0, p1 = window
    assert hp % a0 == 0 and wp % a1 == 0, (hp, wp, window)
    n_wx = wp // a1
    stripe = lambda i, j: (i, j, 0, 0)
    if with_bias:
        args = [
            x,
            y_rel.reshape(a0 * p0, head_dim).astype(x.dtype),
            x_rel.reshape(a1 * p1, head_dim).astype(x.dtype),
        ]
        in_specs = [
            pl.BlockSpec((1, a0, wp, c3), stripe),
            pl.BlockSpec((a0 * p0, head_dim), lambda i, j: (0, 0)),
            pl.BlockSpec((a1 * p1, head_dim), lambda i, j: (0, 0)),
        ]
    else:
        args = [x]
        in_specs = [pl.BlockSpec((1, a0, wp, c3), stripe)]
    return pl.pallas_call(
        _make_grid_kernel(
            heads, head_dim, 1.0 / scale, with_bias, a0, a1, p0, p1, n_wx
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, hp // a0),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, a0, wp, c), stripe),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
