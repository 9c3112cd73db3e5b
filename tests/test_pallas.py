"""Pallas kernel tests (interpret mode on CPU; bit-exactness vs oracles).
On real TPU these were additionally validated in compiled mode."""

import numpy as np

import jax.numpy as jnp

from eventful_transformer_tpu.ops.pallas.scatter import gather_rows, scatter_rows_inplace


def test_scatter_rows_inplace_masked(rng):
    B, N, C, K = 2, 16, 256, 5
    buf = rng.standard_normal((B, N, C)).astype(np.float32)
    vals = rng.standard_normal((B, K, C)).astype(np.float32)
    idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(np.int32)
    mask = rng.integers(0, 2, (B, K)).astype(bool)
    want = buf.copy()
    for b in range(B):
        for i in range(K):
            if mask[b, i]:
                want[b, idx[b, i]] = vals[b, i]
    got = scatter_rows_inplace(
        jnp.asarray(buf), jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_rows(rng):
    B, N, C, K = 2, 16, 256, 7
    buf = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(np.int32)
    got = gather_rows(jnp.asarray(buf), jnp.asarray(idx), interpret=True)
    want = np.stack([buf[b][idx[b]] for b in range(B)])
    np.testing.assert_array_equal(np.asarray(got), want)
