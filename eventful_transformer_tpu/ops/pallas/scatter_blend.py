"""Fused scatter-blend Pallas kernel.

Computes, in one pass over the buffer,

    out[b, n] = values[b, slot(n)]  if n is selected
              = x[b, n]             otherwise

i.e. ``core.indexing.put_rows`` semantics, as a tiled kernel: each (BN, BC)
output tile builds its slice of the one-hot selection matrix on the fly from
the (prefetch-resident) indices, does a (BN, K) x (K, BC) MXU matmul against
the values, and blends with the buffer tile — no full-size intermediates,
single HBM pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blend_kernel(idx_ref, x_ref, vals_ref, out_ref):
    bn = x_ref.shape[1]
    k = vals_ref.shape[1]
    n0 = pl.program_id(1) * bn
    idx = idx_ref[pl.program_id(0)]  # (K,) int32
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (k, bn), 1) + n0
    oh = (idx[:, None] == n_ids).astype(jnp.float32)  # (K, BN)
    scattered = jax.lax.dot_general(
        oh,
        vals_ref[0].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BC)
    cov = jnp.sum(oh, axis=0)[:, None]
    out_ref[0] = (x_ref[0].astype(jnp.float32) * (1.0 - cov) + scattered).astype(
        out_ref.dtype
    )


@partial(jax.jit, static_argnames=("block_n", "block_c", "interpret"))
def scatter_blend(x, values, index, mask=None, block_n=64, block_c=512, interpret=False):
    """put_rows as a fused kernel. x (B, N, C), values (B, K, C),
    index (B, K), mask (B, K) or None."""
    b, n, c = x.shape
    k = index.shape[-1]
    index = index.astype(jnp.int32)
    if mask is not None:
        index = jnp.where(mask, index, n)
    block_c = min(block_c, c)
    grid = (b, pl.cdiv(n, block_n), pl.cdiv(c, block_c))
    return pl.pallas_call(
        _blend_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # whole index array resident (tiny); rows picked by program id
                pl.BlockSpec((b, k), lambda bb, i, j: (0, 0)),
                pl.BlockSpec((1, block_n, block_c), lambda bb, i, j: (bb, i, j)),
                pl.BlockSpec((1, k, block_c), lambda bb, i, j: (bb, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, block_n, block_c), lambda bb, i, j: (bb, i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(index, x, values.astype(x.dtype))
