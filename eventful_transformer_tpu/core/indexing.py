"""Fixed-capacity gather/scatter index utilities.

TPU-native replacement for the reference's ``expand_row_index`` /
``expand_col_index`` + ``gather``/``scatter_`` pattern
(eventful_transformer/utils.py:198-211, modules.py throughout). All shapes
are static; variable token counts are expressed with a boolean validity mask
so XLA traces once per token budget (the padded-capacity design called for in
SURVEY.md §7.2).

Index tensors have shape ``(..., k)`` with any number of leading batch dims;
they broadcast against operands with more dimensions exactly like the
reference expanders (index leading dims align left, missing dims broadcast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_row_index(index, ndim):
    """Reshape (..., k) index for take/put along axis=-2 of an ndim operand."""
    shape = index.shape[:-1] + (1,) * (ndim - index.ndim - 1) + (index.shape[-1], 1)
    return index.reshape(shape)


def expand_col_index(index, ndim):
    """Reshape (..., k) index for take/put along axis=-1 of an ndim operand."""
    shape = index.shape[:-1] + (1,) * (ndim - index.ndim) + (index.shape[-1],)
    return index.reshape(shape)


def take_rows(x, index):
    """Gather rows (tokens along axis=-2): x (..., N, C), index (..., k)."""
    return jnp.take_along_axis(x, expand_row_index(index, x.ndim), axis=-2)


def take_cols(x, index):
    """Gather cols (tokens along axis=-1): x (..., N), index (..., k)."""
    return jnp.take_along_axis(x, expand_col_index(index, x.ndim), axis=-1)


def _one_hot_rows(index, mask, n, ndim, dtype):
    """One-hot selection matrix (..., 1s, k, n) aligned to an ndim operand.

    Invalid (masked-off) slots are redirected out-of-range, where one_hot
    yields an all-zero row — they scatter nothing and never collide.
    """
    if mask is not None:
        index = jnp.where(mask, index, n)
    oh = jax.nn.one_hot(index, n, dtype=dtype)
    shape = index.shape[:-1] + (1,) * (ndim - index.ndim - 1) + oh.shape[-2:]
    return oh.reshape(shape)


def _inverse_index(index, mask, n):
    """Invert a (..., k) slot->position index into a (..., n) position->slot
    map plus a coverage mask. Invalid slots are dropped (redirected
    out-of-bounds). This is a TINY int scatter (B x n elements), cheap on TPU
    unlike value scatters."""
    k = index.shape[-1]
    if mask is not None:
        index = jnp.where(mask, index, n)
    slots = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), index.shape)
    inv = jnp.zeros(index.shape[:-1] + (n,), jnp.int32)
    inv = jnp.put_along_axis(inv, index, slots, axis=-1, inplace=False, mode="drop")
    cov = jnp.zeros(index.shape[:-1] + (n,), bool)
    cov = jnp.put_along_axis(
        cov, index, jnp.ones(index.shape, bool), axis=-1, inplace=False, mode="drop"
    )
    return inv, cov


def put_rows(x, index, values, mask=None):
    """Scatter rows into x at ``index``; entries with mask=False are no-ops.

    TPU-first formulation: XLA value-scatter is ~50x slower than compute on
    these shapes (measured), and a one-hot matmul costs N*k*C real FLOPs.
    Instead: invert the index (tiny int scatter), GATHER the values by the
    inverse permutation, and select — zero FLOPs, pure memory traffic.
    Bit-identical to the reference's ``scatter_(dim=-2, ...)``.
    """
    inv, cov = _inverse_index(index, mask, x.shape[-2])
    gathered = jnp.take_along_axis(
        values, expand_row_index(inv, values.ndim), axis=-2
    )
    return jnp.where(expand_row_index(cov, x.ndim), gathered.astype(x.dtype), x)


def put_cols(x, index, values, mask=None):
    """Scatter cols into x at ``index``; entries with mask=False are no-ops.
    Inverse-permutation gather formulation (see put_rows)."""
    inv, cov = _inverse_index(index, mask, x.shape[-1])
    gathered = jnp.take_along_axis(
        values, expand_col_index(inv, values.ndim), axis=-1
    )
    return jnp.where(expand_col_index(cov, x.ndim), gathered.astype(x.dtype), x)


def coverage(index, mask, n, ndim):
    """Indicator (..., 1s, n) of which positions an index selects (invalid
    slots excluded), aligned for broadcasting against an ndim operand's
    second-to-last axis when [..., None] is appended by the caller."""
    oh = _one_hot_rows(index, mask, n, ndim, jnp.float32)
    return jnp.sum(oh, axis=-2)


def select_rows(p, c, index, mask=None):
    """Replace the rows of ``p`` selected by ``index`` with the SAME rows of
    ``c``: equivalent to gather-from-c + scatter-into-p (the reference gate's
    p update, modules.py:151) but as a pure elementwise select — no scatter.
    """
    cov = coverage(index, mask, p.shape[-2], p.ndim)[..., None]
    return jnp.where(cov > 0, c, p)


def select_cols(p, c, index, mask=None):
    """Column version of :func:`select_rows`."""
    cov = coverage(index, mask, p.shape[-1], p.ndim + 1)
    return jnp.where(cov > 0, c, p)


def mask_rows(x, mask):
    """Zero out rows (axis=-2 entries) where mask is False; mask (..., k)."""
    return jnp.where(expand_row_index(mask, x.ndim), x, 0).astype(x.dtype)


def mask_cols(x, mask):
    """Zero out cols (axis=-1 entries) where mask is False; mask (..., k)."""
    return jnp.where(expand_col_index(mask, x.ndim), x, 0).astype(x.dtype)


def valid_fraction(mask):
    """Fraction of valid entries in a selection mask (traced scalar), used to
    scale FLOP counts so fixed-capacity masked compute reports variable-k
    work. Returns the static 1 when the mask is known to be all-True."""
    if mask is None:
        return 1
    return jnp.mean(mask.astype(jnp.float32))
