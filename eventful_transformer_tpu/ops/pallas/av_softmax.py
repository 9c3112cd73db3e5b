"""Fused softmax -> stale-column select -> A·V matmul for EventfulBlock.

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

Semantics: exactly ``select_cols(p_a, softmax(logits), index, mask)`` and
the subsequent matmul (parity-tested in tests/test_pallas.py). The grid
blocks over (batch*heads, N); cov broadcasts per batch element across heads
and rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(logits_ref, p_ref, cov_ref, v_ref, p_out, y_out):
    l32 = logits_ref[0, 0].astype(jnp.float32)  # (bn, Np)
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


@partial(jax.jit, static_argnames=("block_n", "interpret"))
def softmax_select_matmul(logits, p_a, cov, p_v, *, block_n=512, interpret=False):
    """logits (B, H, N, Np) pre-softmax attention logits (rel-pos applied);
    p_a (B, H, N, Np) stale attention state; cov (B, Np) column selection
    coverage (>0 = refresh); p_v (B, H, Np, d) updated value state.

    Returns (p_a', out) with p_a' = where(cov, softmax(logits), p_a) and
    out = p_a' @ p_v.
    """
    b, h, n, np_ = logits.shape
    d = p_v.shape[-1]
    block_n = min(block_n, n)
    grid = (b * h, pl.cdiv(n, block_n))
    row = lambda i, j: (i // h, i % h, j, 0)
    outs = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_n, np_), row),
                pl.BlockSpec((1, 1, block_n, np_), row),
                pl.BlockSpec((1, 1, np_), lambda i, j: (i // h, 0, 0)),
                pl.BlockSpec((1, 1, np_, d), lambda i, j: (i // h, i % h, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_n, np_), row),
                pl.BlockSpec((1, 1, block_n, d), row),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, np_), p_a.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), p_a.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(logits, p_a, cov.reshape(b, 1, np_).astype(jnp.float32), p_v)
    return outs
