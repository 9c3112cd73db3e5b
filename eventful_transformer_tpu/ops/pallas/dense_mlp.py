"""Fused dense transformer MLP: y = x + W2 @ gelu(W1 @ ln(x)).

The XLA dense MLP materializes the (N, 4C) hidden activation in HBM twice
(write after matmul-1 + read before matmul-2) and runs LN / GELU / skip-add
as separate passes — measured 652 us vs ~500 us of pure matmul time at
ViViT shapes (B=32, N=197, C=768, bf16). This kernel keeps the hidden in
VMEM and fuses LN + GELU + the residual: HBM traffic is read x, write y.

Used by the dense Block's MLP half (core/blocks.py) on TPU; the eventful
blocks use the gated variant (gate_group.py). Exact GELU via XLA's own erf
polynomial (same numerics class as the unfused path; LN and accumulation
in f32)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventful_transformer_tpu.ops.pallas.gate_group import _gelu_exact, _ln_f32


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_out):
    xl = _ln_f32(
        x_ref[0],
        scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32),
    )
    h = jax.lax.dot_general(
        xl.astype(w1_ref.dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h).astype(x_ref.dtype)
    h2 = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    y_out[0] = (h2.astype(x_ref.dtype) + x_ref[0]).astype(y_out.dtype)


@partial(jax.jit, static_argnames=("block_n", "interpret"))
def dense_mlp_residual(x, scale, bias, w1, b1, w2, b2, block_n=256, interpret=False):
    """x (B, N, C) -> ln -> W1 -> gelu -> W2 -> + x, one HBM pass.

    Row blocking: at BATCH 1 an exact tiling is required — at ViTDet N
    (1764 = 4*441) every tiling leaves a tail block that is not a sublane
    multiple (n % 8 == 4), and a batch-1 program combining that
    partial-tail layout with the windowed-attention kernel reproducibly
    faulted the TPU worker (round 3; fine at batch >= 2, fine in
    isolation — an XLA/Mosaic interaction we avoid rather than depend
    on). At batch >= 2 the 256-row blocking stays: whole-N blocks
    measured +0.6 ms/frame on dense ViTDet-672 (grid (B, 1) loses the
    row-block DMA/compute pipelining).
    """
    bsz, n, c = x.shape
    h_dim = w1.shape[-1]
    if bsz == 1 and n % block_n:
        # largest exact multiple-of-8 tiling, else whole-N (the f32 hidden
        # fits scoped VMEM for every batch-1 shape in the model zoo).
        block_n = next(
            (c_ for c_ in range(min(block_n, n), 7, -1)
             if n % c_ == 0 and c_ % 8 == 0),
            n,
        )
    block_n = min(block_n, n)
    vec = lambda i, j: (0, 0)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz, pl.cdiv(n, block_n)),
            in_specs=[
                pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, c), vec),
                pl.BlockSpec((1, c), vec),
                pl.BlockSpec((c, h_dim), vec),
                pl.BlockSpec((1, h_dim), vec),
                pl.BlockSpec((h_dim, c), vec),
                pl.BlockSpec((1, c), vec),
            ],
            out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x,
        scale.reshape(1, -1),
        bias.reshape(1, -1),
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
    )
