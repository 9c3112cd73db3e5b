"""Sequence-parallel (Ulysses-style) attention.

The reference needs no sequence parallelism (N <= 4096, SURVEY.md §5); this
is the scale-out path for longer token streams: tokens are sharded over a
mesh axis through the token-wise ops (LN / qkv / projection / MLP all act
per token, so they need NO communication), and attention — the only
all-token op — runs through two all-to-alls:

    tokens-sharded qkv  --all_to_all-->  heads-sharded full-sequence qkv
    -> exact local attention per head group ->
    heads-sharded output --all_to_all--> tokens-sharded output

Requires heads % P == 0 and N % P == 0. Exact (no approximation), matching
core.blocks.Block._forward_attention for the non-windowed, non-rel-pos,
non-pooled case (the global-attention configuration that grows with N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def make_ulysses_attention(heads, scale, mesh, axis="seq", cast=None):
    """Returns ``fn(qkv) -> out`` where qkv (B, N, 3C) and out (B, N, C)
    are sharded over ``axis`` on the token (N) dimension."""
    n_shards = mesh.shape[axis]
    assert heads % n_shards == 0, (heads, n_shards)

    def local(qkv):
        b, n_local, c3 = qkv.shape
        c = c3 // 3
        head_dim = c // heads
        # (B, N/P, 3, H, D) -> all_to_all tokens<->heads:
        # gather the FULL sequence for H/P local heads.
        x = qkv.reshape(b, n_local, 3, heads, head_dim)
        # split heads axis (3), concat tokens axis (1)
        x = jax.lax.all_to_all(x, axis, split_axis=3, concat_axis=1, tiled=True)
        # x: (B, N, 3, H/P, D)
        q, k, v = jnp.moveaxis(x, 2, 0)  # (B, N, H/P, D) each
        q = jnp.swapaxes(q, 1, 2)  # (B, H/P, N, D)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        a = jnp.matmul(
            q / scale, jnp.swapaxes(k, -2, -1), preferred_element_type=jnp.float32
        )
        a = jax.nn.softmax(a, axis=-1).astype(qkv.dtype)
        if cast is not None:
            a = a.astype(cast)
            v = v.astype(cast)
        o = jnp.matmul(a, v, preferred_element_type=jnp.float32).astype(qkv.dtype)
        o = jnp.swapaxes(o, 1, 2)  # (B, N, H/P, D)
        # heads back together, tokens re-sharded
        o = jax.lax.all_to_all(o, axis, split_axis=1, concat_axis=2, tiled=True)
        # o: (B, N/P, H, D)
        return o.reshape(b, n_local, c)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=P(None, axis, None),
            out_specs=P(None, axis, None),
        )
    )
