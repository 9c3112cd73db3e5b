"""Time the Mosaic compile of the whole-block kernel A variants at the
ViViT operating shape (docs/PERF_NOTES.md round 5).

The ORIGINAL kernel A unrolled the 12-head attention loop with q/k/v
sliced from the (N, 3C) qkv block at 64-lane offsets — unaligned to the
128-wide vector lanes, so every slice is a relayout. Measured: 313 s of
Mosaic compile at the ViViT shape (B=32), ~15 min at B=8. The `perhead`
variant here takes the qkv weight pre-split into per-head stacks
(3, H, C, D) and indexes heads on the LEADING dim (free), producing
q/k/v directly at (N, D); measured 4.4 s compile with bit-identical
outputs — it is now THE shipped formulation (qkv_attention_group does
the weight split internally), so `--variant shipped` and `--variant
perhead` time the same kernel body with the split done inside/outside
the jit. Kept as the record of the experiment. Run on TPU:

    python scripts/misc/time_blockfused_compile.py [--variant shipped|perhead]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventful_transformer_tpu.ops.pallas.block_fused import qkv_attention_group
from eventful_transformer_tpu.ops.pallas.common import ln_f32 as _ln_f32


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _make_perhead_kernel(heads, inv_scale):
    def kernel(
        x_ref, pq_ref, cov_ref, pp_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
        pq_out, attn_out, norms_out,
    ):
        x = x_ref[0]
        wd = x.dtype
        new1 = _ln_f32(
            x, ln1s_ref[0].astype(jnp.float32), ln1b_ref[0].astype(jnp.float32)
        )
        covc = cov_ref[0][0][:, None] > 0
        p1 = jnp.where(covc, new1, pq_ref[0].astype(jnp.float32))
        pq_out[0] = p1.astype(pq_out.dtype)
        p1w = p1.astype(wd)
        outs = []
        for h in range(heads):
            q = (_dot(p1w, wqkv_ref[0, h]).astype(wd)
                 + bqkv_ref[0, h]) * jnp.asarray(inv_scale, wd)
            k = _dot(p1w, wqkv_ref[1, h]).astype(wd) + bqkv_ref[1, h]
            v = _dot(p1w, wqkv_ref[2, h]).astype(wd) + bqkv_ref[2, h]
            logits = _dot(q, k, trans_b=True)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            outs.append(_dot(attn, v).astype(wd))
        a_out = jnp.concatenate(outs, axis=-1)
        attn_out[0] = a_out
        err = a_out.astype(jnp.float32) - pp_ref[0].astype(jnp.float32)
        norms_out[0, 0] = jnp.sqrt(jnp.sum(err * err, axis=-1))

    return kernel


@partial(jax.jit, static_argnames=("heads", "inv_scale"))
def qkv_attention_perhead(
    x, p_qkv, cov, p_proj, ln1_scale, ln1_bias, w_qkv, b_qkv,
    *, heads, inv_scale,
):
    """Kernel-A variant with per-head weight stacks: w_qkv (3, H, C, D),
    b_qkv (3, H, D) — head indexing on leading dims only."""
    bsz, n, c = x.shape
    d = c // heads
    row = lambda i: (i, 0, 0)
    in_specs = [
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, c), row),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((3, heads, c, d), lambda i: (0, 0, 0, 0)),
        pl.BlockSpec((3, heads, 1, d), lambda i: (0, 0, 0, 0)),
    ]
    args = [
        x, p_qkv, cov.reshape(bsz, 1, n).astype(jnp.float32), p_proj,
        ln1_scale.reshape(1, -1), ln1_bias.reshape(1, -1),
        w_qkv, b_qkv.reshape(3, heads, 1, d).astype(x.dtype),
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
        _make_perhead_kernel(heads, inv_scale),
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
    )(*args)
    return p_new, attn, norms[:, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="perhead", choices=["shipped", "perhead"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=197)
    ap.add_argument("--c", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32), jnp.bfloat16)
    b, n, c, h = args.batch, args.n, args.c, args.heads
    d = c // h
    x, pq, pp = f(b, n, c), f(b, n, c), f(b, n, c)
    cov = jnp.zeros((b, n), jnp.float32).at[:, :98].set(1.0)
    s1, b1 = f(c), f(c)
    wqkv, bqkv = f(c, 3 * c), f(3 * c)
    inv_scale = (c / h) ** -0.5

    t0 = time.perf_counter()
    if args.variant == "shipped":
        out = qkv_attention_group(
            x, pq, cov, pp, s1, b1, wqkv, bqkv, heads=h, inv_scale=inv_scale
        )
    else:
        # same math: split the fused weight into per-head stacks
        w4 = wqkv.reshape(c, 3, h, d).transpose(1, 2, 0, 3)
        b4 = bqkv.reshape(3, h, d)
        out = qkv_attention_perhead(
            x, pq, cov, pp, s1, b1, w4, b4, heads=h, inv_scale=inv_scale
        )
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"{args.variant}: compile+first-run {t1 - t0:.1f} s")

    # parity check against the shipped kernel only for the variant
    if args.variant == "perhead":
        ref = qkv_attention_group(
            x, pq, cov, pp, s1, b1, wqkv, bqkv, heads=h, inv_scale=inv_scale
        )
        for a_new, a_ref in zip(out, ref):
            err = np.max(np.abs(np.asarray(a_new, np.float32) - np.asarray(a_ref, np.float32)))
            print(f"  max abs diff vs shipped: {err:.5f}")

    # steady-state runtime
    for _ in range(2):
        if args.variant == "shipped":
            out = qkv_attention_group(
                x, pq, cov, pp, s1, b1, wqkv, bqkv, heads=h, inv_scale=inv_scale
            )
        else:
            out = qkv_attention_perhead(
                x, pq, cov, pp, s1, b1, w4, b4, heads=h, inv_scale=inv_scale
            )
        jax.block_until_ready(out)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        if args.variant == "shipped":
            out = qkv_attention_group(
                x, pq, cov, pp, s1, b1, wqkv, bqkv, heads=h, inv_scale=inv_scale
            )
        else:
            out = qkv_attention_perhead(
                x, pq, cov, pp, s1, b1, w4, b4, heads=h, inv_scale=inv_scale
            )
        jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"{args.variant}: {1e6 * (t1 - t0) / iters:.1f} us/call")


if __name__ == "__main__":
    main()
