"""Whole-group fused gate kernels (round-2 design).

The round-1 kernels (gate_fused.py) eliminated redundant HBM passes but kept
the "recompute" strategy: the gated linear runs on ALL N rows, giving up the
FLOP savings that gating exists to provide. These kernels restore the
savings while keeping the traffic minimal, by doing the whole
gate -> gather -> op -> scatter -> (skip-add) group in ONE HBM pass over the
operands:

  1. p' = where(cov, ln(x) | x, p)              (gate-state select)
  2. c  = E @ p'            -- compact the KCAP selected rows to the front
                               (E is a one-hot built from cov in VMEM; the
                               "gather" is an MXU matmul, costing no HBM)
  3. h  = op(c)             -- the gated linear/MLP on KCAP rows ONLY
  4. y  = where(cov, Eᵀ @ h, b)  -- scatter-blend into the token buffer
  5. optional skip-add fused into the same pass

HBM traffic per group: read x, p, b (+skip), write p', y — the algorithmic
minimum. Matmul FLOPs: KCAP/N of dense (KCAP = k rounded up to the MXU
sublane granule), vs N/N for the round-1 recompute path.

Applicable when the whole (N, C) token block of one batch element fits VMEM
(ViViT-scale N; ViTDet large-N uses the blocked path). Semantics are exactly
the unfused gate->op->buffer pipeline (reference modules.py:104-168 gating,
modules.py:52-101 buffering); golden-tested against the PyTorch reference.

Numerics: LN and matmul accumulation in f32 (same as core.nn.layer_norm /
Linear); the one-hot compaction/scatter matmuls are exact row copies (one
nonzero per row, products 1.0 * value).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventful_transformer_tpu.ops.pallas.common import (  # noqa: F401
    LN_EPS,
    copy_precision as _copy_precision,
    gelu_exact as _gelu_exact,
    ln_f32 as _ln_f32,
)


def _compaction_onehot(cov_row, kcap, dtype):
    """(KCAP, N) one-hot: row j holds a 1 at the j-th selected position.

    cov_row: (1, N) f32, >0 where selected. Selected positions keep their
    index order (pos = running count of selections), matching the index
    order of jax.lax.top_k after the scatter (order is semantically
    irrelevant — everything is scattered back by position).
    """
    n = cov_row.shape[-1]
    covb = cov_row > 0  # (1, N)
    # Prefix sum via an inclusive lower-triangular matmul (Mosaic has no
    # cumsum lowering): cs[i] = #selected among positions <= i. The iotas
    # broadcast from (N, 1)/(1, N) vectors — materializing (N, N) i32
    # iotas costs 2 x 4 N^2 bytes of VMEM (25 MB at ViTDet N=1764).
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    cs = jax.lax.dot_general(
        covb.astype(jnp.float32), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, N)
    pos = cs.astype(jnp.int32) - 1  # (1, N), position among selected
    j = jax.lax.broadcasted_iota(jnp.int32, (kcap, n), 0)
    e = (pos == j) & covb  # (KCAP, N): row j == j-th selected position
    return e.astype(dtype)


def _cumsum_lanes(x):
    """Inclusive prefix sum of a (1, N) f32 vector along the lane axis via
    Hillis-Steele doubling on ``pltpu.roll`` (Mosaic has no cumsum lowering;
    the (N, N) triangular-matmul alternative is VMEM-hungry at large N).
    log2(N) roll+mask+add vector steps, exact for 0/1 inputs."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis=1)  # shifted[i] = x[i - d] (circular)
        x = x + jnp.where(col >= d, shifted, 0.0)
        d *= 2
    return x


def _topk_cov(new, p_row, kcap):
    """In-kernel exact top-k selection coverage.

    new, p_row: (N, C) f32 (gate-domain current + reference state). Returns
    cov (1, N) f32, 1.0 at the kcap largest error norms — the same SET
    jax.lax.top_k selects (ties at the k-th value broken by smallest index).

    Radix bisection over the norm BIT PATTERNS (non-negative IEEE f32
    bit patterns order like integers): 4 phases narrow the k-th largest
    value V by 8 bits each. Each phase evaluates all 256 byte candidates IN
    PARALLEL — a (256, N) compare matrix and one (256, N) x (N, 1)
    ones-matmul row-count on the MXU — so the serial chain is 4 steps, not
    the 31 scalar reductions of the naive bit-serial bisection, and there is
    no (N, N) comparison matrix (the previous rank-compare formulation,
    which hung the Mosaic compile at N=1764). Ties at V are broken by
    smallest index via a roll-based prefix sum, matching lax.top_k's stable
    order exactly.
    """
    err = new - p_row
    # sqrt to match the two-phase path's tie behavior exactly (top_k runs on
    # sqrt'd norms there; f32 sqrt can merge near-ties that squared norms
    # would distinguish).
    norms = jnp.sqrt(jnp.sum(err * err, axis=-1, keepdims=True))  # (N, 1)
    n = norms.shape[0]
    keys = jax.lax.bitcast_convert_type(norms, jnp.int32)  # (N, 1), >= 0
    keys_row = keys.reshape(1, n)
    ones_col = jnp.ones((n, 1), jnp.float32)
    kf = jnp.float32(kcap)
    prefix = jnp.zeros((256, 1), jnp.int32)
    byte = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    # Invariant per phase: count(keys >= prefix) >= kcap; the largest byte b
    # with count(keys >= prefix | b << shift) >= kcap extends the prefix
    # (b = 0 always qualifies, so the max is well-defined).
    for shift in (23, 15, 7, 0):
        # phase 4 covers 7 bits (31-bit non-negative patterns): candidates
        # 128..255 alias 0..127 — harmless, the max picks the true byte
        # because count() is monotone in the candidate.
        cands = prefix | (byte << shift)  # (256, 1)
        ge = (keys_row >= cands).astype(jnp.float32)  # (256, N)
        cnt = jax.lax.dot_general(
            ge, ones_col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (256, 1)
        best = jnp.max(jnp.where(cnt >= kf, byte, 0))  # scalar
        prefix = prefix | (best << shift)
    v = prefix[0, 0]  # the k-th largest key (bit pattern)
    gt = (keys_row > v).astype(jnp.float32)  # (1, N)
    eq = (keys_row == v).astype(jnp.float32)
    n_gt = jax.lax.dot_general(
        gt, ones_col,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    tie_rank = _cumsum_lanes(eq)  # inclusive prefix count of ties
    cov = gt + eq * (tie_rank <= kf - n_gt).astype(jnp.float32)
    return cov


def _gate_domain(x_row, scale, bias, ln_mode):
    """The gate-domain view of the incoming tokens (f32)."""
    if ln_mode == "post":
        return _ln_f32(x_row, scale, bias)
    return x_row.astype(jnp.float32)  # "pre" / "none": input domain


def _select_state(new, p_row, cov_row):
    """p' = where(cov, new, p). cov_row (1, N) f32 (reshape the f32 before
    comparing: Mosaic can't insert a minor dim on i1 vectors)."""
    covc = cov_row[0][:, None] > 0  # (N, 1)
    return jnp.where(covc, new, p_row.astype(jnp.float32))


def _make_linear_kernel(ln_mode, kcap, with_skip, select_topk, emit_norms=False):
    def kernel(*refs):
        if emit_norms:
            # extra inputs (p_next, next_scale, next_bias) precede the
            # outputs; the norms output comes last
            *refs, norms_out = refs
            pn_ref, ns_ref, nb_ref = refs[-6], refs[-5], refs[-4]
            refs = refs[:-6] + refs[-3:]
        if select_topk:
            cov_refs = ()
            if with_skip:
                (x_ref, p_ref, b_ref, skip_ref, scale_ref, bias_ref,
                 w_ref, wb_ref, p_out, b_out, y_out) = refs
            else:
                (x_ref, p_ref, b_ref, scale_ref, bias_ref,
                 w_ref, wb_ref, p_out, b_out) = refs
        elif with_skip:
            (x_ref, p_ref, b_ref, skip_ref, cov_ref, scale_ref, bias_ref,
             w_ref, wb_ref, p_out, b_out, y_out) = refs
        else:
            (x_ref, p_ref, b_ref, cov_ref, scale_ref, bias_ref,
             w_ref, wb_ref, p_out, b_out) = refs
        scale = scale_ref[0].astype(jnp.float32)
        bias = bias_ref[0].astype(jnp.float32)
        new = _gate_domain(x_ref[0], scale, bias, ln_mode)
        if select_topk:
            cov_row = _topk_cov(new, p_ref[0].astype(jnp.float32), kcap)
        else:
            cov_row = cov_ref[0]  # (1, N)
        p_new = _select_state(new, p_ref[0], cov_row)
        p_out[0] = p_new.astype(p_out.dtype)
        e = _compaction_onehot(cov_row, kcap, p_out.dtype)  # (KCAP, N)
        # Compact the selected rows (exact row copies on the MXU).
        c = jax.lax.dot_general(
            e, p_new.astype(e.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(e.dtype),
        )
        if ln_mode == "pre":
            c = _ln_f32(c, scale, bias)
        h = jax.lax.dot_general(
            c.astype(w_ref.dtype), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + wb_ref[0].astype(jnp.float32)
        h = h.astype(b_out.dtype)
        # Scatter back (exact row copies) and blend with the buffer.
        scattered = jax.lax.dot_general(
            e, h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(e.dtype),
        ).astype(b_out.dtype)
        covc = cov_row[0][:, None] > 0
        y = jnp.where(covc, scattered, b_ref[0])
        b_out[0] = y
        if with_skip:
            yv = (y + skip_ref[0]).astype(y_out.dtype)
            y_out[0] = yv
            if emit_norms:
                # next-gate error norms on the ROUNDED output — the MLP
                # gate reads these instead of re-reading y (cross-group
                # pass sharing, docs/PERF_NOTES.md round 4)
                nl = _ln_f32(
                    yv, ns_ref[0].astype(jnp.float32),
                    nb_ref[0].astype(jnp.float32),
                )
                en = nl - pn_ref[0].astype(jnp.float32)
                norms_out[0, 0] = jnp.sqrt(jnp.sum(en * en, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("ln_mode", "kcap", "interpret"))
def gate_group_linear(
    x, p, b, cov, scale, bias, w, wb, skip=None, p_next=None, next_scale=None,
    next_bias=None, *, ln_mode, kcap, interpret=False
):
    """Fused gate->linear->buffer group.

    x (B, N, C) group input; p (B, N, C) gate state; b (B, N, F) token
    buffer; w (C, F), wb (F,); skip (B, N, F) optional fused residual.

    cov (B, N) is the selection coverage (>0 = selected) — pass ``None`` to
    select the top-``kcap`` error norms INSIDE the kernel (exact lax.top_k
    set; saves the separate norms pass + XLA top_k round trip; only valid
    for mask-free fixed-k policies).

    Returns (p', b') or (p', b', b' + skip). ln_mode as in gate_fused.py:
    "post" = gate after LN (p in LN domain), "pre" = gate before LN,
    "none" = no LN (projection group).

    ``p_next``/``next_scale``/``next_bias`` (requires ``skip``): also emit
    the NEXT gate's post-LN error norms ``||ln(y)*s + b - p_next||`` (B, N)
    f32 from the output block in VMEM (pass sharing); appended to the
    returns.
    """
    bsz, n, c = x.shape
    f = w.shape[-1]
    with_skip = skip is not None
    select_topk = cov is None
    emit_norms = p_next is not None
    assert not (emit_norms and not with_skip)
    row = lambda i: (i, 0, 0)
    vec = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, f), row),
    ]
    args = [x, p, b]
    if with_skip:
        in_specs.append(pl.BlockSpec((1, n, f), row))
        args.append(skip)
    if not select_topk:
        in_specs.append(pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)))
        args.append(cov.reshape(bsz, 1, n).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((c, f), vec),
        pl.BlockSpec((1, f), vec),
    ]
    args += [
        scale.reshape(1, -1),
        bias.reshape(1, -1),
        w,
        wb.reshape(1, -1),
    ]
    out_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, f), row),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, n, c), p.dtype),
        jax.ShapeDtypeStruct((bsz, n, f), b.dtype),
    ]
    if with_skip:
        out_specs.append(pl.BlockSpec((1, n, f), row))
        out_shape.append(jax.ShapeDtypeStruct((bsz, n, f), x.dtype))
    if emit_norms:
        in_specs += [
            pl.BlockSpec((1, n, f), row),
            pl.BlockSpec((1, f), vec),
            pl.BlockSpec((1, f), vec),
        ]
        args += [p_next, next_scale.reshape(1, -1), next_bias.reshape(1, -1)]
        out_specs.append(pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32))
    outs = pl.pallas_call(
        _make_linear_kernel(ln_mode, kcap, with_skip, select_topk, emit_norms),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
        # In-place state update: p'/b' overwrite p/b. Without this the
        # frame scan copies every state leaf once per iteration (the HLO
        # while body showed 122 full (1, N, C) copies/frame at ViTDet-672
        # batch 1 — pallas outputs are fresh allocations XLA must copy
        # back into the loop carry). Each grid instance reads exactly the
        # block it overwrites, so aliasing is safe.
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Whole-(N, C)-block design: f32 weights alone exceed the 16M
            # default scoped-VMEM limit; v5e has 128M physical VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if emit_norms:
        return tuple(outs[:-1]) + (outs[-1][:, 0],)
    return tuple(outs)


def _make_mlp_kernel(ln_mode, kcap, select_topk, emit_norms=False):
    def kernel(*refs):
        if emit_norms:
            # extra inputs (p_next, next_scale, next_bias) precede the
            # outputs; the norms output comes last
            *refs, norms_out = refs
            pn_ref, ns_ref, nb_ref = refs[-6], refs[-5], refs[-4]
            refs = refs[:-6] + refs[-3:]
        if select_topk:
            (x_ref, p_ref, b_ref, scale_ref, bias_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, p_out, b_out, y_out) = refs
        else:
            (x_ref, p_ref, b_ref, cov_ref, scale_ref, bias_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, p_out, b_out, y_out) = refs
        scale = scale_ref[0].astype(jnp.float32)
        bias = bias_ref[0].astype(jnp.float32)
        new = _gate_domain(x_ref[0], scale, bias, ln_mode)
        if select_topk:
            cov_row = _topk_cov(new, p_ref[0].astype(jnp.float32), kcap)
        else:
            cov_row = cov_ref[0]
        p_new = _select_state(new, p_ref[0], cov_row)
        p_out[0] = p_new.astype(p_out.dtype)
        e = _compaction_onehot(cov_row, kcap, p_out.dtype)
        c = jax.lax.dot_general(
            e, p_new.astype(e.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(e.dtype),
        )
        if ln_mode == "pre":
            c = _ln_f32(c, scale, bias)
        h = jax.lax.dot_general(
            c.astype(w1_ref.dtype), w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        # Match the unfused path's dtype trajectory: the hidden activation is
        # cast to the working dtype between the two Linears.
        h = _gelu_exact(h).astype(x_ref.dtype)
        h2 = jax.lax.dot_general(
            h.astype(w2_ref.dtype), w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0].astype(jnp.float32)
        h2 = h2.astype(b_out.dtype)
        scattered = jax.lax.dot_general(
            e, h2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(e.dtype),
        ).astype(b_out.dtype)
        covc = cov_row[0][:, None] > 0
        y = jnp.where(covc, scattered, b_ref[0])
        b_out[0] = y
        yv = (y + x_ref[0]).astype(y_out.dtype)
        y_out[0] = yv
        if emit_norms:
            # next-gate error norms on the ROUNDED output (exactly what a
            # separate ln_norms pass over y would read back from HBM):
            # ||ln(y)*s + b - p_next|| per token, f32 — one full read of y
            # saved for the next gate's selection front (cross-block /
            # cross-group pass sharing, docs/PERF_NOTES.md round 4)
            nl = _ln_f32(
                yv, ns_ref[0].astype(jnp.float32), nb_ref[0].astype(jnp.float32)
            )
            e = nl - pn_ref[0].astype(jnp.float32)
            norms_out[0, 0] = jnp.sqrt(jnp.sum(e * e, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("ln_mode", "kcap", "interpret"))
def gate_group_mlp(
    x, p, b, cov, scale, bias, w1, b1, w2, b2, p_next=None, next_scale=None,
    next_bias=None, *, ln_mode, kcap, interpret=False
):
    """Fused gate->MLP->buffer group with the residual folded in.

    x doubles as the skip (the reference's skip_2 is the MLP group input,
    blocks.py:446-450). The hidden activation (KCAP, 4C) never leaves VMEM.

    cov: selection coverage, or ``None`` for in-kernel top-kcap selection
    (see gate_group_linear). Returns (p', b', y) with y = b' + x.

    ``p_next`` (B, N, C) with ``next_scale``/``next_bias``: also emit the
    NEXT gate's post-LN error norms ``||ln(y)*s + b - p_next||`` (B, N) f32
    from the output block while it is still in VMEM (the next block's qkv
    gate reads them instead of re-reading y — cross-block pass sharing).
    Returns (p', b', y, norms) in that case.
    """
    bsz, n, c = x.shape
    h_dim = w1.shape[-1]
    select_topk = cov is None
    emit_norms = p_next is not None
    row = lambda i: (i, 0, 0)
    vec = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
    ]
    args = [x, p, b]
    if not select_topk:
        in_specs.append(pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)))
        args.append(cov.reshape(bsz, 1, n).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((c, h_dim), vec),
        pl.BlockSpec((1, h_dim), vec),
        pl.BlockSpec((h_dim, c), vec),
        pl.BlockSpec((1, c), vec),
    ]
    args += [
        scale.reshape(1, -1),
        bias.reshape(1, -1),
        w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
    ]
    out_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, n, c), p.dtype),
        jax.ShapeDtypeStruct((bsz, n, c), b.dtype),
        jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
    ]
    if emit_norms:
        in_specs += [
            pl.BlockSpec((1, n, c), row),
            pl.BlockSpec((1, c), vec),
            pl.BlockSpec((1, c), vec),
        ]
        args += [p_next, next_scale.reshape(1, -1), next_bias.reshape(1, -1)]
        out_specs.append(pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32))
    outs = pl.pallas_call(
        _make_mlp_kernel(ln_mode, kcap, select_topk, emit_norms),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
        # In-place state update (see gate_group_linear): p'/b' overwrite
        # p/b so the frame scan's loop carry needs no per-iteration copy.
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Whole-(N, C)-block design: f32 weights alone exceed the 16M
            # default scoped-VMEM limit; v5e has 128M physical VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if emit_norms:
        return outs[0], outs[1], outs[2], outs[3][:, 0]
    return outs
