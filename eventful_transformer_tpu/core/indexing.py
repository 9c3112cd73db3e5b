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


def put_rows(x, index, values, mask=None):
    """Scatter rows into x at ``index``; entries with mask=False are no-ops.

    Equivalent to the reference's ``scatter_(dim=-2, ...)`` with variable-k
    semantics recovered via the mask: invalid slots are redirected
    out-of-bounds and dropped by XLA scatter semantics (never colliding with
    valid slots — a "rewrite the old value" scheme would race when a valid
    slot targets the same row).
    """
    if mask is not None:
        index = jnp.where(mask, index, x.shape[-2])
    idx = jnp.broadcast_to(expand_row_index(index, x.ndim), values.shape)
    return jnp.put_along_axis(
        x, idx, values.astype(x.dtype), axis=-2, inplace=False, mode="drop"
    )


def put_cols(x, index, values, mask=None):
    """Scatter cols into x at ``index``; entries with mask=False are no-ops."""
    if mask is not None:
        index = jnp.where(mask, index, x.shape[-1])
    idx = jnp.broadcast_to(expand_col_index(index, x.ndim), values.shape)
    return jnp.put_along_axis(
        x, idx, values.astype(x.dtype), axis=-1, inplace=False, mode="drop"
    )


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
