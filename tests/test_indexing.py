"""Unit tests for core/indexing.py fixed-capacity gather/scatter utilities.

The one-hot matmul col-gather (`_take_cols_onehot`) is routed only on TPU
(it exists to avoid minor-axis-gather relayout copies, docs/PERF_NOTES.md);
these tests force it on CPU and check bit-exactness against
``take_along_axis`` — including duplicate and masked-padding indices.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eventful_transformer_tpu.core.indexing import (
    _take_cols_onehot,
    expand_col_index,
    put_cols,
    select_cols,
    take_cols,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "x_shape,i_shape",
    [
        ((2, 4, 9, 31), (2, 5)),  # ViTDet attention-matrix shape pattern
        ((2, 31), (2, 5)),  # per-row gather, x.ndim == index.ndim
        ((3, 7, 31), (3, 31)),  # full-capacity
        ((2, 4, 9, 31), (5,)),  # unbatched index broadcast
    ],
)
def test_take_cols_onehot_exact(dtype, x_shape, i_shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), dtype)
    n = x_shape[-1]
    index = jnp.asarray(rng.integers(0, n, i_shape), jnp.int32)
    # duplicates + the padding convention (masked slots redirected to 0)
    index = index.at[..., 0].set(index[..., -1])
    want = jnp.take_along_axis(x, expand_col_index(index, x.ndim), axis=-1)
    got = _take_cols_onehot(x, index)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_put_cols_matches_select_cols_on_distinct_indices():
    """TokenDeltaGate's col-state update switched from select_cols(p, c) to
    put_cols(p, index, take_cols(c)) — verify equivalence (the blend must be
    bit-identical when valid indices are distinct)."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((2, 3, 6, 17)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 3, 6, 17)), jnp.float32)
    index = jnp.asarray([[3, 0, 11, 5], [16, 2, 0, 9]], jnp.int32)
    mask = jnp.asarray([[True, True, True, False], [True, False, False, True]])
    want = select_cols(p, c, index, mask)
    got = put_cols(p, index, take_cols(c, index), mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
