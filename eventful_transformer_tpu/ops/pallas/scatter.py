"""Pallas TPU kernels for the eventful hot path: in-place row scatter.

XLA offers no good option for "write k rows into an N-row HBM buffer":
value-scatters lower to per-element updates (~50x slow), and the one-hot
matmul workaround costs N*k*C FLOPs plus a full N*C buffer copy. This kernel
DMAs exactly the k touched rows into the (aliased, in-place) buffer —
O(k*C) traffic, zero FLOPs.

Semantics match core.indexing.put_rows: distinct indices, mask=False slots
are no-ops; numerics are bit-identical (pure row copies), verified against
the XLA path in tests.

STATUS: experimental / not wired into the framework path. Measured in
isolation it beats the XLA one-hot blend, but an opaque pallas_call blocks
XLA's consumer fusion so it loses end-to-end (docs/PERF_NOTES.md); only
ops/pallas/scatter_blend.py is routable (behind indexing.USE_PALLAS_BLEND,
default off). These kernels are exercised by tests/bench only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, mask_ref, vals_hbm, buf_in, buf_out, sem):
    del buf_in  # aliased with buf_out
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(mask_ref[b, i] != 0)
    def _():
        copy = pltpu.make_async_copy(
            vals_hbm.at[b, i], buf_out.at[b, idx_ref[b, i]], sem
        )
        copy.start()
        copy.wait()


LANE = 128


@partial(jax.jit, static_argnames=("interpret",))
def scatter_rows_inplace(buffer, values, index, mask=None, interpret=False):
    """buffer (B, N, C) <- values (B, K, C) at rows index (B, K).

    Returns the updated buffer (the input is donated/aliased — do not reuse
    it). mask (B, K) marks valid slots; None means all valid. Rows are viewed
    as (C/128, 128) blocks so single-row DMA only slices untiled leading dims
    (Mosaic requires tiled-dim slices be 8-aligned).
    """
    b, n, c = buffer.shape
    k = index.shape[-1]
    assert c % LANE == 0, c
    if mask is None:
        mask = jnp.ones((b, k), jnp.int32)
    buffer4 = buffer.reshape(b, n, c // LANE, LANE)
    values4 = values.astype(buffer.dtype).reshape(b, k, c // LANE, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # values
            pl.BlockSpec(memory_space=pltpu.ANY),  # buffer (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buffer4.shape, buffer.dtype),
        input_output_aliases={3: 0},  # buffer input (after 2 scalar args) -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(index.astype(jnp.int32), mask.astype(jnp.int32), values4, buffer4)
    return out.reshape(b, n, c)


def _gather_kernel(idx_ref, buf_hbm, out_hbm, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(buf_hbm.at[b, idx_ref[b, i]], out_hbm.at[b, i], sem)
    copy.start()
    copy.wait()


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows(buffer, index, interpret=False):
    """rows (B, K, C) <- buffer (B, N, C) at index (B, K)."""
    b, n, c = buffer.shape
    k = index.shape[-1]
    assert c % LANE == 0, c
    buffer4 = buffer.reshape(b, n, c // LANE, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k, c // LANE, LANE), buffer.dtype),
        interpret=interpret,
    )(index.astype(jnp.int32), buffer4)
    return out.reshape(b, k, c)
