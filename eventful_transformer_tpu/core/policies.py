"""Token-selection policies (reference eventful_transformer/policies.py).

All policies return a fixed-capacity ``(index, mask)`` pair:

  * ``index``: int32 (..., k) token indices (distinct within each row —
    produced by top-k, so masked scatters never collide);
  * ``mask``: bool (..., k), True for valid selections.

This replaces the reference's dynamic-size outputs (``nonzero`` in
policies.py:28, variable-k thresholds) with the padded design XLA requires:
one compilation per token budget. Numerical equivalence: compute runs on all
``k`` capacity slots but masked slots scatter nothing and count nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _vector_norm(e, axis, order):
    if order == 2:
        return jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=axis))
    if order == 1:
        return jnp.sum(jnp.abs(e.astype(jnp.float32)), axis=axis)
    a = jnp.abs(e.astype(jnp.float32)) ** order
    return jnp.sum(a, axis=axis) ** (1.0 / order)


class TokenNormTopK:
    """Select the k tokens with the largest error norm
    (reference policies.py:39-68).

    ``save_status=True`` caches the last input/output on the policy object
    for debugging and visualization (reference policies.py:64-67). Only
    meaningful outside jit (eager debugging) — under jit the cached values
    are tracers from the last trace."""

    def __init__(self, k, order=2, save_status=False):
        self.k = k
        self.order = order
        self.save_status = save_status
        self.last_input = None
        self.last_output = None

    def capacity(self, n_tokens):
        return min(self.k, n_tokens)

    def select(self, e, norm_axis, ctx=None):
        """e: error tensor; norm reduced over ``norm_axis``; token axis is the
        remaining trailing axis. Returns (index, mask)."""
        norms = _vector_norm(e, norm_axis, self.order)
        index, mask = self.select_from_norms(norms, ctx)
        if self.save_status:
            self.last_input = e
            self.last_output = index
        return index, mask

    def select_from_norms(self, norms, ctx=None):
        """Select from precomputed error norms (..., N) — used by fused
        kernels that produce the norms themselves."""
        k = self.capacity(norms.shape[-1])
        _, index = jax.lax.top_k(norms, k)
        return index.astype(jnp.int32), None  # None mask == all valid


class TokenNormTopFraction(TokenNormTopK):
    """Select a fraction of tokens with the largest error norm
    (reference policies.py:71-95)."""

    def __init__(self, fraction, order=2):
        assert 0.0 <= fraction <= 1.0
        super().__init__(k=None, order=order)
        self.fraction = fraction

    def capacity(self, n_tokens):
        return int(self.fraction * n_tokens)


class TokenNormThreshold:
    """Select tokens whose error norm exceeds a threshold
    (reference policies.py:6-36), reformulated with a static capacity: the
    top-``capacity`` tokens by norm are candidates and the mask keeps those
    above the threshold. With capacity == n_tokens this is exactly the
    reference's variable-k behavior (compute is padded, counts are masked)."""

    def __init__(self, threshold=0.0, order=2, capacity=None):
        self.threshold = threshold
        self.order = order
        self._capacity = capacity

    def capacity(self, n_tokens):
        return n_tokens if self._capacity is None else min(self._capacity, n_tokens)

    def select(self, e, norm_axis, ctx=None):
        return self.select_from_norms(_vector_norm(e, norm_axis, self.order), ctx)

    def select_from_norms(self, norms, ctx=None):
        k = self.capacity(norms.shape[-1])
        values, index = jax.lax.top_k(norms, k)
        mask = values > self.threshold
        if ctx is not None and k < norms.shape[-1]:
            # Saturation signal for capacity-bucketed dispatch
            # (utils/bucketing.py): a gate whose EVERY capacity slot is over
            # threshold may have truncated the selection — the dispatcher
            # escalates to a larger compiled bucket and re-runs, keeping
            # results exact. Counted as #saturated batch rows.
            ctx.add(
                "policy_saturated",
                jnp.sum(jnp.all(mask, axis=-1).astype(jnp.float32)),
            )
        return index.astype(jnp.int32), mask
