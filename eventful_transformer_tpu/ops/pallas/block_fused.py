"""Whole-block resident kernel pipeline for ViViT-scale token counts.

At N=197 the per-block-step traffic floor of the v2mlp dispatch (the
measured wall-clock optimum through round 4) is set by FUSION BOUNDARIES,
not VMEM capacity: the activation and its qkv expansion make multiple HBM
round trips between the gate fronts, the recompute matmuls, and attention
(docs/PERF_NOTES.md round-3/4 ceiling analysis; VERDICT r4 ask 5). The
monolithic whole-block kernel (one pallas program for all three groups +
attention) requires the top-k SELECTION in-kernel — and the radix
bisection selection is a Mosaic compile catastrophe (measured round 5:
181 s to compile ONE selection at N=24, B=2 — three of them put the
whole-block kernel past a 560 s compile timeout at TINY shapes). The
selection is also the only part XLA does well at these shapes (batched
lax.top_k on (B, N) norms costs ~20 us).

So the whole-block step is a PIPELINE of three pallas kernels split
exactly at the top-k boundaries, with XLA seeing nothing but (B, N) norm
vectors between them:

  kernel A (qkv + attention):  p_qkv' = select(cov1, ln(x));
      qkv = p_qkv' @ Wqkv + b (dense recompute, reference TokenGate
      buffer==op(p) semantics); multi-head attention with heads sliced at
      static lane offsets; EMITS the proj gate's error norms from the
      attention output still in VMEM. The (N, 3C) qkv block — the
      biggest intermediate of the v2mlp path — never exists in HBM.
  kernel B (projection):  p_proj' = select(cov2, attn); y1 = p_proj' @
      Wproj + b + skip; EMITS the MLP gate's post-LN error norms.
  kernel C: the existing gate_group_mlp (gated MLP + scatter-blend +
      residual; hidden never leaves VMEM).

Semantics are EXACTLY the v2mlp dispatch path this replaces (select-only
qkv/proj gates with dense recompute — reference blocks.py:416-436 — and
the gated MLP group, blocks.py:440-450); golden-tested against the
unfused XLA path in tests/test_pallas.py. FLOP counts are added by the
caller (core/blocks.py) with the unfused path's exact keys and formulas.

Numerics: LN and softmax in f32; matmuls take working-dtype inputs with
f32 MXU accumulation and round to the working dtype between ops (the XLA
path's trajectory — bf16-level parity on TPU, f32 parity in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventful_transformer_tpu.ops.pallas.common import (
    ln_f32 as _ln_f32,
)


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _select_rows(new_f32, p_ref_row, cov_row):
    """p' = where(cov, new, p); cov_row (1, N) f32."""
    covc = cov_row[0][:, None] > 0
    return jnp.where(covc, new_f32, p_ref_row.astype(jnp.float32))


def _make_qkv_attention_kernel(heads, inv_scale):
    # Slice discipline (measured round 5, scripts/misc/
    # time_blockfused_compile.py + docs/PERF_NOTES.md): the qkv projection
    # must stay ONE full-width (N, 3C) matmul — splitting it into per-head
    # (C, 64) matmuls halves MXU utilization on the projection and measured
    # 0.88x end-to-end (vs 1.083x). But slicing q/k/v per head at h*64 lane
    # offsets straight from the (N, 3C) block is a Mosaic compile
    # catastrophe (313 s: every 64-offset slice of the wide block is an
    # unaligned relayout). So: slice 128-ALIGNED head PAIRS from the wide
    # block (offsets h2*128, c, 2c all lane-tile-aligned), then subdivide
    # only the small (N, 128) pair tiles into 64-lane halves.
    def kernel(
        x_ref, pq_ref, cov_ref, pp_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
        pq_out, attn_out, norms_out,
    ):
        x = x_ref[0]
        wd = x.dtype
        c = x.shape[-1]
        head_dim = c // heads
        new1 = _ln_f32(
            x, ln1s_ref[0].astype(jnp.float32), ln1b_ref[0].astype(jnp.float32)
        )
        p1 = _select_rows(new1, pq_ref[0], cov_ref[0])
        pq_out[0] = p1.astype(pq_out.dtype)
        qkv = _dot(p1.astype(wd), wqkv_ref[...]).astype(wd) + bqkv_ref[0]
        scale = jnp.asarray(inv_scale, wd)

        def attend(q, k, v):
            logits = _dot(q * scale, k, trans_b=True)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            return _dot(attn, v).astype(wd)

        outs = []
        if head_dim % 128 == 0 or c <= 256:
            # aligned per-head slices, or a block narrow enough that the
            # relayouts are trivial (small-dim test shapes)
            for h in range(heads):
                sl = lambda base: qkv[:, base + h * head_dim:
                                      base + (h + 1) * head_dim]
                outs.append(attend(sl(0), sl(c), sl(2 * c)))
        else:
            assert heads % 2 == 0 and (2 * head_dim) % 128 == 0, (
                "v4 kernel A requires lane-tile-alignable head pairs; "
                "_v4_eligible must gate this"
            )
            for h2 in range(heads // 2):
                pair = lambda base: qkv[:, base + h2 * 2 * head_dim:
                                        base + (h2 + 1) * 2 * head_dim]
                qp, kp, vp = pair(0), pair(c), pair(2 * c)
                for s in range(2):
                    half = slice(s * head_dim, (s + 1) * head_dim)
                    outs.append(attend(qp[:, half], kp[:, half], vp[:, half]))
        a_out = jnp.concatenate(outs, axis=-1)
        attn_out[0] = a_out
        # proj gate error norms (input domain) from the block in VMEM
        err = a_out.astype(jnp.float32) - pp_ref[0].astype(jnp.float32)
        norms_out[0, 0] = jnp.sqrt(jnp.sum(err * err, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("heads", "inv_scale", "interpret"))
def qkv_attention_group(
    x, p_qkv, cov, p_proj, ln1_scale, ln1_bias, w_qkv, b_qkv,
    *, heads, inv_scale, interpret=False,
):
    """Fused [qkv-gate select -> dense qkv recompute -> attention ->
    proj-gate norms] — kernel A of the whole-block pipeline.

    x (B, N, C); p_qkv gate state (post-LN domain); cov (B, N) selection
    coverage from the qkv gate's top-k; p_proj (input-domain state, read
    only for the norms emission). Returns (p_qkv', attn_out, proj_norms).
    p_qkv' aliases p_qkv in place.
    """
    bsz, n, c = x.shape
    row = lambda i: (i, 0, 0)
    vec = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((c, 3 * c), vec),
        pl.BlockSpec((1, 3 * c), vec),
    ]
    args = [
        x, p_qkv, cov.reshape(bsz, 1, n).astype(jnp.float32), p_proj,
        ln1_scale.reshape(1, -1), ln1_bias.reshape(1, -1),
        w_qkv, b_qkv.reshape(1, -1).astype(x.dtype),
    ]
    out_specs = (
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((bsz, n, c), p_qkv.dtype),
        jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
    )
    p_new, attn, norms = pl.pallas_call(
        _make_qkv_attention_kernel(heads, inv_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        # p_qkv' overwrites p_qkv (no scan-carry copies; gate_group.py).
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the (C, 3C) qkv weight + per-head logits stay resident
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return p_new, attn, norms[:, 0]


def _make_proj_kernel():
    def kernel(
        a_ref, pp_ref, cov_ref, skip_ref, pm_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
        pp_out, y_out, norms_out,
    ):
        a = a_ref[0]
        wd = a.dtype
        p2 = _select_rows(a.astype(jnp.float32), pp_ref[0], cov_ref[0])
        pp_out[0] = p2.astype(pp_out.dtype)
        proj = _dot(p2.astype(wd), wproj_ref[...]).astype(wd) + bproj_ref[0]
        y1 = proj + skip_ref[0]
        y_out[0] = y1
        # MLP gate error norms (post-LN domain) from the block in VMEM
        nl = _ln_f32(
            y1, ln2s_ref[0].astype(jnp.float32), ln2b_ref[0].astype(jnp.float32)
        )
        err = nl - pm_ref[0].astype(jnp.float32)
        norms_out[0, 0] = jnp.sqrt(jnp.sum(err * err, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def proj_group(
    attn, p_proj, cov, skip, p_mlp, w_proj, b_proj, ln2_scale, ln2_bias,
    *, interpret=False,
):
    """Fused [proj-gate select -> dense proj recompute -> skip-add ->
    MLP-gate norms] — kernel B of the whole-block pipeline.

    Returns (p_proj', y1, mlp_norms); p_proj' aliases p_proj in place.
    """
    bsz, n, c = attn.shape
    row = lambda i: (i, 0, 0)
    vec = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((c, c), vec),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((1, c), vec),
        pl.BlockSpec((1, c), vec),
    ]
    args = [
        attn, p_proj, cov.reshape(bsz, 1, n).astype(jnp.float32), skip, p_mlp,
        w_proj, b_proj.reshape(1, -1).astype(attn.dtype),
        ln2_scale.reshape(1, -1), ln2_bias.reshape(1, -1),
    ]
    out_specs = (
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((bsz, n, c), p_proj.dtype),
        jax.ShapeDtypeStruct((bsz, n, c), attn.dtype),
        jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
    )
    p_new, y1, norms = pl.pallas_call(
        _make_proj_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return p_new, y1, norms[:, 0]
