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
    """Gather cols (tokens along axis=-1): x (..., N), index (..., k).

    TPU layout note: a gather along the MINOR axis of a large array makes
    XLA relayout the operand (profiled on the ViTDet EventfulBlock path:
    each col-gather of the (B, H, N, Np) attention matrix induced a
    transposed-layout ``copy`` of the WHOLE operand, ~145 us at N=1764 —
    docs/PERF_NOTES.md). On TPU, float col-gathers are therefore expressed
    as one-hot matmuls: exact row copies on the MXU (one nonzero per
    output, products 1.0 * value — bit-exact at any dtype), standard
    layouts, no relayout copies. Duplicate/padding indices are fine (pure
    gather: each output col copies independently).

    PRECONDITION: the operand must be FINITE everywhere, including in
    unselected columns — the one-hot matmul computes 0 * x for unselected
    entries, and 0 * inf/nan = nan poisons the output where take_along_axis
    would simply ignore those columns. All framework call sites gather
    finite post-softmax/state tensors; do not use this for pre-softmax
    logits padded with -inf.
    """
    if _onehot_gather_eligible(x):
        return _take_cols_onehot(x, index)
    return jnp.take_along_axis(x, expand_col_index(index, x.ndim), axis=-1)


def _onehot_gather_eligible(x):
    if not jnp.issubdtype(x.dtype, jnp.floating) or x.dtype == jnp.float64:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _take_cols_onehot(x, index):
    """take_cols as an exact one-hot MXU matmul (see take_cols)."""
    n = x.shape[-1]
    squeeze = x.ndim == index.ndim  # per-row gather of a (..., N) operand
    if squeeze:
        x = x[..., None, :]
    oh = jax.nn.one_hot(index, n, dtype=x.dtype)  # (..., k, n)
    shape = index.shape[:-1] + (1,) * (x.ndim - index.ndim - 1) + oh.shape[-2:]
    oh = oh.reshape(shape)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.matmul(
        x, jnp.swapaxes(oh, -1, -2), preferred_element_type=x.dtype,
        precision=prec,
    )
    return out[..., 0, :] if squeeze else out


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


# Route 3-D row scatters to the fused Pallas scatter-blend kernel. In
# isolation the kernel beats the XLA one-hot path by ~20%, but inside the
# full block XLA fuses the one-hot blend into the consumer (skip-add), which
# the opaque pallas_call prevents — net slower end-to-end. Off by default;
# see docs/PERF_NOTES.md.
USE_PALLAS_BLEND = False


def _pallas_blend_eligible(x, index):
    if not USE_PALLAS_BLEND:
        return False
    if x.ndim != 3 or index.ndim != 2 or x.shape[-1] % 128 != 0:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def put_rows(x, index, values, mask=None):
    """Scatter rows into x at ``index``; entries with mask=False are no-ops.

    TPU-first formulation (chosen empirically — see docs/PERF_NOTES.md):
    XLA value-scatters are ~50x slower than the MXU on these shapes, and even
    tiny int scatters (an inverse-permutation index) are slow, so the scatter
    is a one-hot matmul + coverage blend:

        out = x * (1 - covered) + one_hotᵀ @ values

    ``covered`` is exactly 0/1, so untouched rows are bit-identical to x and
    touched rows are bit-identical to values (one nonzero per one-hot row).
    Equivalent to the reference's ``scatter_(dim=-2, ...)``. On TPU, 3-D row
    scatters route to the fused Pallas kernel (same semantics, one pass).

    PRECONDITION: valid entries of ``index`` must be DISTINCT. A duplicate
    makes ``covered`` exceed 1 and the blend produces ``-x + v1 + v2``
    instead of torch ``scatter_``'s single-write. All framework call sites
    satisfy this (top-k policies, deduped pooled indices); new forced-index
    call sites must guarantee it too.
    """
    if _pallas_blend_eligible(x, index):
        from eventful_transformer_tpu.ops.pallas.scatter_blend import scatter_blend

        return scatter_blend(x, values, index, mask)
    n = x.shape[-2]
    oh = _one_hot_rows(index, mask, n, x.ndim, x.dtype)  # (..., k, n)
    scattered = jnp.matmul(
        jnp.swapaxes(oh, -1, -2), values.astype(x.dtype), preferred_element_type=x.dtype
    )
    covered = jnp.sum(oh, axis=-2)[..., None]  # (..., n, 1)
    return x * (1 - covered) + scattered


def put_cols(x, index, values, mask=None):
    """Scatter cols into x at ``index``; entries with mask=False are no-ops.
    One-hot matmul formulation (see put_rows, including the distinct-indices
    precondition)."""
    n = x.shape[-1]
    oh = _one_hot_rows(index, mask, n, x.ndim, x.dtype)  # (..., k, n)
    scattered = jnp.matmul(
        values.astype(x.dtype), oh, preferred_element_type=x.dtype
    )
    covered = jnp.sum(oh, axis=-2)  # (..., n)
    covered = covered[..., None, :]
    return x * (1 - covered) + scattered


def coverage(index, mask, n, ndim):
    """Indicator (..., 1s, n) of which positions an index selects (invalid
    slots excluded), aligned for broadcasting against an ndim operand's
    second-to-last axis when [..., None] is appended by the caller."""
    oh = _one_hot_rows(index, mask, n, ndim, jnp.float32)
    return jnp.sum(oh, axis=-2)


def coverage_from_norms(norms, k):
    """Top-k selection indicator straight from the error norms — the EXACT
    set ``jax.lax.top_k`` selects (ties at the k-th value broken by smallest
    index; XLA's top-k is stable) — without materializing the (..., k, n)
    one-hot that :func:`coverage` builds from indices. Only valid for
    mask-free fixed-k policies.

    norms (..., n) non-negative -> cov (..., n) f32 with exactly min(k, n)
    ones per row."""
    import jax

    if k >= norms.shape[-1]:
        return jnp.ones(norms.shape, jnp.float32)
    kth = jax.lax.top_k(norms, k)[0][..., k - 1 : k]  # (..., 1)
    return coverage_from_kth(norms, kth, k)


def coverage_from_kth(norms, kth, k):
    """:func:`coverage_from_norms` given a precomputed k-th largest value
    (..., 1) — for callers that already ran ``lax.top_k`` and hold its
    values, avoiding a second sort."""
    gt = norms > kth
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)
    eq = norms == kth
    # ties at the k-th value: keep the smallest indices up to the quota
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)  # inclusive
    cov = gt | (eq & (tie_rank <= k - n_gt))
    return cov.astype(jnp.float32)


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
