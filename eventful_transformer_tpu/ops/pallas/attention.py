"""Fused multi-head self-attention kernel (whole-block, logits in VMEM).

At eventful-transformer scales (N = 197 ViViT tokens, N = 196 ViTDet window
tokens riding the batch axis) the XLA attention path pays three full HBM
round-trips for the (B, H, N, N) logits (matmul-1 write, softmax read+write,
matmul-2 read) plus the head-split/merge transposes of the (B, N, 3C) QKV
tensor. This kernel computes the whole attention block for one batch element
in VMEM: the QKV rows are read ONCE in their packed (N, 3C) layout, heads
are sliced in-register, and only the (N, C) output is written.

Semantics match core.blocks.Block._forward_attention exactly (reference
blocks.py:205-246): q is pre-scaled (q / scale, not the product), softmax in
f32, optional ``matmul_2_cast`` low-precision A·V (reference
blocks.py:183-189). No relative-position bias (ViViT / windowed ViTDet
blocks without rel-pos); callers with rel-pos keep the XLA path.

Grid is (batch,); each instance loops over heads. Head dim slices are
static lane offsets of the packed QKV block, so no transposes ever
materialize in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(heads, head_dim, scale, cast_dtype):
    def kernel(qkv_ref, out_ref):
        c = heads * head_dim
        x = qkv_ref[0]  # (N, 3C)
        for h in range(heads):
            q = x[:, h * head_dim:(h + 1) * head_dim].astype(jnp.float32)
            k = x[:, c + h * head_dim:c + (h + 1) * head_dim].astype(jnp.float32)
            v = x[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            a = jax.lax.dot_general(
                q * jnp.float32(1.0 / scale), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, N)
            a = a - jnp.max(a, axis=-1, keepdims=True)
            a = jnp.exp(a)
            a = a / jnp.sum(a, axis=-1, keepdims=True)
            if cast_dtype is not None:
                a = a.astype(cast_dtype)
                v = v.astype(cast_dtype)
            av = jax.lax.dot_general(
                a, v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, :, h * head_dim:(h + 1) * head_dim] = av.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("heads", "scale", "cast", "interpret"))
def fused_attention(qkv, *, heads, scale, cast=None, interpret=False):
    """qkv (B, N, 3C) packed as the reference's fused qkv linear emits it
    (reshaped (N, 3, H, D) row-major) -> attention output (B, N, C).

    ``cast``: optional jnp dtype for the A·V matmul (matmul_2_cast)."""
    bsz, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    kernel = _make_kernel(heads, head_dim, scale, cast)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz,),
            in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv)
