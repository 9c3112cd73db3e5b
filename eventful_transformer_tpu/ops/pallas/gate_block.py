"""Blocked (tiled-over-N) gate-group kernel for large token counts.

The whole-group kernels in gate_group.py hold one batch element's full
(N, C)/(N, F) blocks in VMEM — fine at ViViT/ViTDet-672 token counts, not at
ViTDet-1024 (N=4096, where the qkv buffer alone is (4096, 2304)). This module
covers the large-N regime — the regime where eventfulness pays most (the
gated matmuls are k/N of dense with k/N as low as 1/16) — with a DIFFERENT
factorization:

  * selection (error norms -> top-k -> sorted indices -> rank) runs in XLA
    (batched lax.top_k costs ~20 us; docs/PERF_NOTES.md);
  * the gated op itself (linear or MLP) runs in XLA on the k compacted rows
    ``h = op(ln(take_rows(x, index)))`` — a well-shaped k-row matmul;
  * ONE blocked Pallas kernel fuses everything that touches full-size
    state — gate-state select, buffer scatter-blend, and the skip-add —
    into a single HBM pass, tiled over N:

        p'_blk = where(cov_blk, ln(x_blk) | x_blk, p_blk)
        y_blk  = where(cov_blk, E_blk @ h, b_blk)          (+ skip_blk)

    where E_blk[i, j] = (rank[i] == j) & cov[i] is the local one-hot built
    from the prefix-sum ``rank`` of the coverage (exact row copies on the
    MXU). This replaces the unfused path's separate LN pass, p-select pass
    and one-hot put_rows (scatter matmul + full-buffer blend) — read x, p,
    b (+skip), write p', y is the algorithmic traffic minimum.

``h`` is passed whole to every grid instance (kcap*F stays a few MB at every
reference operating point, k <= 1024); the E_blk matmul costs N*kcap*F
MAC-FLOPs total — identical to the XLA one-hot scatter it replaces, but
fused with the blend instead of materializing an (N, F) intermediate.

Semantics are exactly the unfused gathered gate->op->buffer pipeline
(reference eventful_transformer/modules.py:104-168 gating, modules.py:52-101
buffering, blocks.py:422-463 group structure); parity-tested against the
unfused path in tests/test_pallas.py. Numerics: LN in f32 (as
core.nn.layer_norm); one-hot copy matmuls at HIGHEST precision for f32
(DEFAULT quantizes f32 through bf16 MXU passes) and DEFAULT for bf16
(products 1.0 * value are exact anyway; Mosaic rejects HIGHEST bf16).
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

from eventful_transformer_tpu.ops.pallas.common import (  # noqa: F401,E402
    copy_precision as _copy_precision,
)


def _make_kernel(apply_ln, out_mode, emit_norms=False):
    """out_mode: None (p', b' only), "skip" (+ y = b' + skip input),
    "x" (+ y = b' + x input — the MLP group's residual).
    ``emit_norms`` (requires an out_mode): extra inputs p_next/scale/bias,
    extra output = next-gate post-LN error norms of the y block."""

    def kernel(*refs):
        if emit_norms:
            # extra inputs precede the outputs; norms output comes last
            *refs, norms_out = refs
            pn_ref, ns_ref, nb_ref = refs[-6], refs[-5], refs[-4]
            refs = refs[:-6] + refs[-3:]
        if out_mode == "skip":
            (x_ref, p_ref, b_ref, skip_ref, cov_ref, idx_ref, h_ref,
             scale_ref, bias_ref, p_out, b_out, y_out) = refs
        elif out_mode == "x":
            (x_ref, p_ref, b_ref, cov_ref, idx_ref, h_ref,
             scale_ref, bias_ref, p_out, b_out, y_out) = refs
        else:
            (x_ref, p_ref, b_ref, cov_ref, idx_ref, h_ref,
             scale_ref, bias_ref, p_out, b_out) = refs
        if apply_ln:
            new = _ln_f32(
                x_ref[0],
                scale_ref[0].astype(jnp.float32),
                bias_ref[0].astype(jnp.float32),
            )
        else:
            new = x_ref[0].astype(jnp.float32)
        covc = cov_ref[0, 0][:, None] > 0  # (bn, 1)
        p_new = jnp.where(covc, new, p_ref[0].astype(jnp.float32))
        p_out[0] = p_new.astype(p_out.dtype)
        h = h_ref[0]
        kp = h.shape[0]
        bn = covc.shape[0]
        # One-hot from the SELECTION INDEX LIST directly: e[i, j] = 1 iff
        # h's row j is this block's token i (global position). No sorted
        # order, no rank cumsum, no host-side scatter — the (bn, kp) i32
        # compare replaces all three (the sorted-rank formulation cost a
        # (B, k) sort per select, and its scatter-based replacement lowered
        # to a slow XLA scatter — both measured, docs/PERF_NOTES.md r4).
        block_i = pl.program_id(1)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (bn, kp), 0)
            + block_i * bn
        )
        idx = idx_ref[0].astype(jnp.int32)  # (1, kp)
        e = (pos == idx).astype(h.dtype)
        scattered = jax.lax.dot_general(
            e, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_copy_precision(e.dtype),
        ).astype(b_out.dtype)
        y = jnp.where(covc, scattered, b_ref[0])
        b_out[0] = y
        yv = None
        if out_mode == "skip":
            yv = (y + skip_ref[0]).astype(y_out.dtype)
            y_out[0] = yv
        elif out_mode == "x":
            yv = (y + x_ref[0]).astype(y_out.dtype)
            y_out[0] = yv
        if emit_norms:
            # next-gate error norms on the ROUNDED output block while it is
            # still in VMEM: ||ln(y)*s + b - p_next|| per token, f32 — the
            # next gate's selection front reads these instead of re-reading
            # y from HBM (pass sharing, docs/PERF_NOTES.md round 4)
            nl = _ln_f32(
                yv, ns_ref[0].astype(jnp.float32), nb_ref[0].astype(jnp.float32)
            )
            en = nl - pn_ref[0].astype(jnp.float32)
            norms_out[0, 0] = jnp.sqrt(jnp.sum(en * en, axis=-1))

    return kernel


@partial(
    jax.jit,
    static_argnames=("apply_ln", "residual_x", "block_n", "interpret"),
)
def block_select_scatter(
    x, p, b, cov, index, h, scale, bias, skip=None, p_next=None,
    next_scale=None, next_bias=None, *,
    apply_ln, residual_x=False, block_n=512, interpret=False,
):
    """Fused gate-state select + buffer scatter-blend (+ residual), blocked
    over the token axis.

    x, p (B, N, C); b (B, N, F) token buffer; cov (B, N) selection coverage
    (>0 = selected); index (B, KP) the selected token positions, any order
    (invalid/padding slots must hold an out-of-range value, e.g. N); h
    (B, KP, F) with row j holding the op output for token index[j]; skip
    (B, N, F) optional fused residual; ``residual_x`` instead adds x itself
    (the MLP group; requires F == C).

    Returns (p', b') or (p', b', b' + skip|x). ``apply_ln``: gate domain is
    ln(x) (gate-after-LN groups) vs x (gate-before-LN / projection groups).

    ``p_next``/``next_scale``/``next_bias`` (requires a y output): also
    emit the NEXT gate's post-LN error norms ``||ln(y)*s + b - p_next||``
    (B, N) f32 per output block (pass sharing); appended to the returns.
    """
    bsz, n, c = x.shape
    f = b.shape[-1]
    kp = h.shape[-2]
    assert not (residual_x and skip is not None)
    out_mode = "x" if residual_x else ("skip" if skip is not None else None)
    emit_norms = p_next is not None
    assert not (emit_norms and out_mode is None)
    block_n = min(block_n, n)
    # Scoped-VMEM fit: the pipeline double-buffers every blocked operand, so
    # per-instance bytes ~ 2*bn*row_bytes + 2*kp*f (the h block) + f32 stack.
    # The qkv group at N=4096 (C=768, F=2304) measured 16.3M at bn=512 —
    # 304K over the 16M scoped limit (compile-time OOM). Halve bn until the
    # double-buffered blocks fit a 13M budget, leaving stack headroom.
    itemsize = jnp.dtype(x.dtype).itemsize
    row_bytes = itemsize * (
        2 * c  # x, p in
        + f  # b in
        + (f if out_mode == "skip" else 0)  # skip in
        + (f if emit_norms else 0)  # p_next in
        + c + f  # p', b' out
        + (f if out_mode is not None else 0)  # y out
    ) + (8 if emit_norms else 4)  # cov in (+ norms out)
    h_bytes = kp * f * itemsize
    while block_n > 128 and 2 * (block_n * row_bytes + h_bytes) > 13 * 2**20:
        block_n //= 2
    grid = (bsz, pl.cdiv(n, block_n))
    row_c = lambda i, j: (i, j, 0)
    vec_n = lambda i, j: (i, 0, j)
    full = lambda i, j: (i, 0, 0)
    const = lambda i, j: (0, 0)
    in_specs = [
        pl.BlockSpec((1, block_n, c), row_c),
        pl.BlockSpec((1, block_n, c), row_c),
        pl.BlockSpec((1, block_n, f), row_c),
    ]
    args = [x, p, b]
    if out_mode == "skip":
        in_specs.append(pl.BlockSpec((1, block_n, f), row_c))
        args.append(skip)
    in_specs += [
        pl.BlockSpec((1, 1, block_n), vec_n),
        pl.BlockSpec((1, 1, kp), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, kp, f), full),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
    ]
    args += [
        cov.reshape(bsz, 1, n).astype(jnp.float32),
        index.reshape(bsz, 1, kp).astype(jnp.int32),
        h,
        scale.reshape(1, -1),
        bias.reshape(1, -1),
    ]
    out_specs = [
        pl.BlockSpec((1, block_n, c), row_c),
        pl.BlockSpec((1, block_n, f), row_c),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, n, c), p.dtype),
        jax.ShapeDtypeStruct((bsz, n, f), b.dtype),
    ]
    if out_mode is not None:
        out_specs.append(pl.BlockSpec((1, block_n, f), row_c))
        out_shape.append(jax.ShapeDtypeStruct((bsz, n, f), x.dtype))
    if emit_norms:
        in_specs += [
            pl.BlockSpec((1, block_n, f), row_c),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((1, f), const),
        ]
        args += [p_next, next_scale.reshape(1, -1), next_bias.reshape(1, -1)]
        out_specs.append(pl.BlockSpec((1, 1, block_n), vec_n))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32))
    outs = pl.pallas_call(
        _make_kernel(apply_ln, out_mode, emit_norms),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        # In-place state update (see gate_group_linear): p'/b' overwrite
        # p/b. Each (i, j) grid instance reads exactly the (i, j) block it
        # writes, so aliasing is safe; without it the frame scan copies
        # every state leaf back into the loop carry each iteration.
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(*args)
    if emit_norms:
        return tuple(outs[:-1]) + (outs[-1][:, 0],)
    return tuple(outs)

# -- window-resident buffer variant (round 4) ---------------------------------
#
# For WINDOWED eventful-tokenwise blocks the qkv buffer's only consumer is
# windowed attention, which needs the window-partitioned layout — the fused
# path paid a pad+6-D-transpose relayout of the full (N, 3C) buffer every
# step (profiled as layout-conversion copies on the pallas output,
# docs/PERF_NOTES.md round 4). Storing the buffer PERMANENTLY window-major
# makes the partition a free reshape; the combined select+scatter kernel
# splits into two (identical total HBM traffic, one extra launch):
#
#   * block_select_p: gate-state select over row-major x/p tiles;
#   * block_scatter_rows: buffer scatter-blend over window-major b tiles,
#     with the top-k indices remapped through the static window permutation
#     in XLA (a (B, k) int gather). Coverage is derived IN-KERNEL from the
#     one-hot index match (exactly the rows present in the index list, the
#     same rows coverage_from_kth marks); invalid slots hold -1, which can
#     never match a row position (out-of-range markers could collide with a
#     partial edge tile's padded iota rows).
#
# Pad rows (out-of-image window positions) are initialized to the qkv bias
# row at flush (reference blocks.py:269-287 pad semantics) and are never
# selected, so they persist across steps — the per-step in-kernel pad
# substitution of the non-resident path disappears too.


def _select_p_kernel(apply_ln):
    def kernel(x_ref, p_ref, cov_ref, scale_ref, bias_ref, p_out):
        if apply_ln:
            new = _ln_f32(
                x_ref[0],
                scale_ref[0].astype(jnp.float32),
                bias_ref[0].astype(jnp.float32),
            )
        else:
            new = x_ref[0].astype(jnp.float32)
        covc = cov_ref[0, 0][:, None] > 0  # (bn, 1)
        p_out[0] = jnp.where(covc, new, p_ref[0].astype(jnp.float32)).astype(
            p_out.dtype
        )

    return kernel


@partial(jax.jit, static_argnames=("apply_ln", "block_n", "interpret"))
def block_select_p(x, p, cov, scale, bias, *, apply_ln, block_n=1024,
                   interpret=False):
    """Gate-state select only: p' = where(cov, ln(x)|x, p), blocked over N.

    x, p (B, N, C); cov (B, N) selection coverage (>0 = selected). The
    row-major half of the split select/scatter pair used by the
    window-resident buffer path (see module docstring)."""
    bsz, n, c = x.shape
    block_n = min(block_n, n)
    itemsize = jnp.dtype(x.dtype).itemsize
    row_bytes = itemsize * 3 * c + 4  # x, p in; p' out; cov in
    while block_n > 128 and 2 * block_n * row_bytes > 13 * 2**20:
        block_n //= 2
    row_c = lambda i, j: (i, j, 0)
    outs = pl.pallas_call(
        _select_p_kernel(apply_ln),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz, pl.cdiv(n, block_n)),
            in_specs=[
                pl.BlockSpec((1, block_n, c), row_c),
                pl.BlockSpec((1, block_n, c), row_c),
                pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, c), row_c),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(
        x,
        p,
        cov.reshape(bsz, 1, n).astype(jnp.float32),
        scale.reshape(1, -1),
        bias.reshape(1, -1),
    )
    return outs


def _scatter_rows_kernel(b_ref, idx_ref, h_ref, b_out):
    h = h_ref[0]
    kp = h.shape[0]
    bn = b_ref.shape[1]
    block_i = pl.program_id(1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, kp), 0) + block_i * bn
    idx = idx_ref[0].astype(jnp.int32)  # (1, kp); invalid slots hold -1
    e_f32 = (pos == idx).astype(jnp.float32)
    e = e_f32.astype(h.dtype)
    # reduce + compare in f32 (Mosaic rejects the bf16 comparison)
    covc = jnp.sum(e_f32, axis=-1)[:, None] > 0
    scattered = jax.lax.dot_general(
        e, h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_copy_precision(e.dtype),
    ).astype(b_out.dtype)
    b_out[0] = jnp.where(covc, scattered, b_ref[0])


@partial(jax.jit, static_argnames=("block_n", "interpret"))
def block_scatter_rows(b, index, h, *, block_n=512, interpret=False):
    """Buffer scatter-blend only: b'[i] = h[j] where index[j] == i, else
    b[i] — blocked over the (window-major) row axis.

    b (B, NW, F); index (B, KP) target row positions in ANY order with
    invalid slots holding -1 (never matches); h (B, KP, F) rows to place.
    Coverage comes from the one-hot match itself."""
    bsz, n, f = b.shape
    kp = h.shape[-2]
    block_n = min(block_n, n)
    itemsize = jnp.dtype(b.dtype).itemsize
    row_bytes = itemsize * 2 * f  # b in, b' out
    h_bytes = kp * f * itemsize
    while block_n > 128 and 2 * (block_n * row_bytes + h_bytes) > 13 * 2**20:
        block_n //= 2
    row_c = lambda i, j: (i, j, 0)
    outs = pl.pallas_call(
        _scatter_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz, pl.cdiv(n, block_n)),
            in_specs=[
                pl.BlockSpec((1, block_n, f), row_c),
                pl.BlockSpec((1, 1, kp), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, kp, f), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, f), row_c),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, f), b.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(b, index.reshape(bsz, 1, kp).astype(jnp.int32), h)
    return outs
