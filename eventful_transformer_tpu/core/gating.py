"""Gates, token buffers and matmul accumulators — the eventful state machine.

Functional re-design of eventful_transformer/modules.py. The reference keeps
mutable per-module tensors (``self.p``, ``self.b``, ``self.product``) with
documented aliasing hazards (modules.py:70-72,125-127,189-193). Here every
piece of temporal state is an explicit pytree entry returned from
``flush``/``incremental``; aliasing is impossible by construction and the
per-frame loop compiles to a single ``lax.scan``.

The reference's per-module ``first`` flags (modules.py:73-76 pattern) are
hoisted to one flush/incremental branch per *block* (see core/blocks.py):
all gates of a block reset together (base.py:130), so the branch structures
are identical.

Selection indices come from core/policies.py as fixed-capacity
``(index, mask)`` pairs; a ``None`` mask means all slots valid.
"""

from __future__ import annotations

import jax.numpy as jnp

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.core.indexing import (
    mask_cols,
    mask_rows,
    put_cols,
    put_rows,
    select_cols,
    select_rows,
    take_cols,
    take_rows,
    valid_fraction,
)
from eventful_transformer_tpu.core.nn import counted_matmul


class TokenGate:
    """Reference-state token gate (reference modules.py:104-168).

    ``structure`` selects the token axis: "row" (= axis -2, norm over -1) or
    "col" (= axis -1, norm over -2).
    """

    def __init__(self, structure="row"):
        assert structure in ("row", "col")
        self.structure = structure
        self.policy = None  # injected via utils.misc.set_policies equivalent

    def init_state(self, shape, dtype=jnp.float32):
        return {"p": jnp.zeros(shape, dtype)}

    def flush(self, state, c):
        """First time step: pass everything through, store reference."""
        return c, {"p": c}

    def _select(self, e, forced_index, forced_mask, ctx=None):
        if forced_index is not None:
            return forced_index, forced_mask
        norm_axis = -1 if self.structure == "row" else -2
        return self.policy.select(e, norm_axis, ctx)

    def incremental(self, ctx: Ctx, state, c, forced_index=None, forced_mask=None):
        """Returns (c_tilde, index, mask, state)."""
        ctx.add("gate_flops", c.size)
        p = state["p"]
        index, mask = self._select(c - p, forced_index, forced_mask, ctx)
        # The p update writes back rows of c at their own positions, so it is
        # a pure select — no scatter (TPU-first; exact).
        if self.structure == "row":
            c_tilde = take_rows(c, index)
            p = select_rows(p, c, index, mask)
        else:
            c_tilde = take_cols(c, index)
            p = select_cols(p, c, index, mask)
        return c_tilde, index, mask, {"p": p}

    def select_only_ok(self):
        """Whether :meth:`incremental_select` may replace :meth:`incremental`
        for consumers that never touch the gathered rows or indices."""
        from eventful_transformer_tpu.core.policies import TokenNormTopK

        return (
            type(self) is TokenGate
            and self.structure == "row"
            and isinstance(self.policy, TokenNormTopK)
            and not self.policy.save_status
        )

    def incremental_select(self, ctx: Ctx, state, c, norms=None):
        """Gate-state update WITHOUT gathering the selected rows — for
        consumers that recompute the op from the reference state (the
        buffer-free groups in core/blocks.py). Skips the (…, k, C) row
        gather, the index materialization, and the (…, k, N) one-hot that
        :func:`coverage` builds: selection comes straight from the norms
        (:func:`core.indexing.coverage_from_norms`, exact top-k semantics).
        Only valid when :meth:`select_only_ok`. ``norms``: precomputed
        error norms from an upstream kernel (pass sharing; requires
        order-2 post-LN gating — the caller guarantees the domain matches).
        Returns (kcap, state)."""
        from eventful_transformer_tpu.core.indexing import coverage_from_norms
        from eventful_transformer_tpu.core.policies import _vector_norm

        ctx.add("gate_flops", c.size)
        p = state["p"]
        if norms is None:
            norms = _vector_norm(c - p, -1, self.policy.order)
        kcap = self.policy.capacity(c.shape[-2])
        cov = coverage_from_norms(norms, kcap)
        p = jnp.where(cov[..., None] > 0, c, p)
        return kcap, {"p": p}


class TokenDeltaGate(TokenGate):
    """Token gate that also emits the error deltas ``e_tilde``
    (reference modules.py:171-201). Invalid slots have their deltas zeroed so
    downstream delta-accumulation contributes nothing for them."""

    def incremental(self, ctx: Ctx, state, c, forced_index=None, forced_mask=None):
        """Returns (c_tilde, e_tilde, index, mask, state)."""
        ctx.add("gate_flops", c.size)
        p = state["p"]
        if forced_index is None:
            index, mask = self._select(c - p, forced_index, forced_mask, ctx)
        else:
            # Forced selection: the error tensor is only consumed at the
            # forced positions, so gather first and subtract on the small
            # arrays — materializing the full-size ``c - p`` at ViTDet
            # attention shapes costs a full (B, H, N, Np) pass + a layout
            # copy (profiled; docs/PERF_NOTES.md). PRECONDITION: valid
            # forced indices must be DISTINCT — the col branch updates state
            # via put_cols, whose one-hot blend corrupts duplicated
            # positions (-p + v1 + v2 instead of a single write). Current
            # callers guarantee this (_pool_index dedups; top-k indices are
            # distinct); new forced-index callers must too.
            index, mask = forced_index, forced_mask
        if self.structure == "row":
            c_tilde = take_rows(c, index)
            e_tilde = c_tilde - take_rows(p, index)
            if mask is not None:
                e_tilde = mask_rows(e_tilde, mask)
            p = select_rows(p, c, index, mask)
        else:
            c_tilde = take_cols(c, index)
            e_tilde = c_tilde - take_cols(p, index)
            if mask is not None:
                e_tilde = mask_cols(e_tilde, mask)
            p = put_cols(p, index, c_tilde, mask)
        return c_tilde, e_tilde, index, mask, {"p": p}


class SimpleSTGTGate(TokenGate):
    """Baseline gate from "Spatio-Temporal Gated Transformers": the reference
    state is overwritten with the FULL current input each step, so errors are
    measured vs. the previous frame rather than the last-updated value
    (reference modules.py:6-49). Row structure only."""

    def __init__(self, structure="row"):
        assert structure == "row"
        super().__init__(structure)

    def incremental(self, ctx: Ctx, state, c, forced_index=None, forced_mask=None):
        ctx.add("gate_flops", c.size)
        index, mask = self._select(c - state["p"], forced_index, forced_mask, ctx)
        c_tilde = take_rows(c, index)
        return c_tilde, index, mask, {"p": c}


class TokenBuffer:
    """Persistent token state (reference modules.py:52-101)."""

    def __init__(self, structure="row"):
        assert structure in ("row", "col")
        self.structure = structure

    def init_state(self, shape, dtype=jnp.float32):
        return {"b": jnp.zeros(shape, dtype)}

    def flush(self, state, x):
        return x, {"b": x}

    def incremental(self, state, x, index, mask=None):
        put = put_rows if self.structure == "row" else put_cols
        b = put(state["b"], index, x, mask)
        return b, {"b": b}


class MatmulBuffer:
    """Incrementally-updated q·kᵀ product (reference modules.py:204-252).

    Steady-state cost is O(N·k·d) instead of O(N²·d): recompute the updated
    rows (q_tilde @ k) and the updated cols (q @ k_tilde) and scatter them
    into the cached product.

    TPU-first (exact): the cached product is pure memoization — every entry
    was last written as q_i·k_j with both vectors at their CURRENT buffer
    values (rows update when q_i changes, cols when k_j changes, and both
    always write current values), so ``product == q @ k`` identically at
    every step. :meth:`incremental_recompute` exploits this: one dense
    matmul (N·d·Np FLOPs) replaces the cached state, its carry traffic and
    the two one-hot scatter matmuls (N·k·Np FLOPs each — MORE expensive
    than the recompute whenever head_dim d < capacity k, as at every
    reference operating point). Reported FLOP counts keep the reference's
    incremental row/col semantics via valid_frac (same convention as the
    token-buffer recompute, core/blocks.py).
    """

    def init_state(self, shape, dtype=jnp.float32):
        return {"product": jnp.zeros(shape, dtype)}

    def flush(self, ctx: Ctx, state, q, k):
        product = counted_matmul(ctx, q, k)
        return product, {"product": product}

    def incremental(self, ctx: Ctx, state, q, k, index_q, index_k, mask_q=None, mask_k=None):
        product = state["product"]
        q_tilde = take_rows(q, index_q)
        rows = counted_matmul(ctx, q_tilde, k, valid_frac=valid_fraction(mask_q))
        product = put_rows(product, index_q, rows, mask_q)
        k_tilde = take_cols(k, index_k)
        cols = counted_matmul(ctx, q, k_tilde, valid_frac=valid_fraction(mask_k))
        product = put_cols(product, index_k, cols, mask_k)
        return product, {"product": product}

    def incremental_recompute(self, ctx: Ctx, q, k, index_q, index_k,
                              mask_q=None, mask_k=None):
        """Stateless equivalent of :meth:`incremental` (see class docstring).
        Counts mirror the reference's two incremental matmuls exactly."""
        product = jnp.matmul(q, k, preferred_element_type=q.dtype)
        d = q.shape[-1]
        batch = product.size // (product.shape[-2] * product.shape[-1])
        rows_out = batch * index_q.shape[-1] * product.shape[-1]
        cols_out = batch * product.shape[-2] * index_k.shape[-1]
        ctx.add("matmul_flops", valid_fraction(mask_q) * float(rows_out * d))
        ctx.add("matmul_flops", valid_fraction(mask_k) * float(cols_out * d))
        return product


class MatmulDeltaAccumulator:
    """Incrementally-updated A·V product (reference modules.py:255-299):

        product += a_n_tilde @ v_delta_tilde
        product += a_delta_tilde @ (v_n_tilde - v_delta_tilde)

    Invalid capacity slots must arrive with zeroed deltas (TokenDeltaGate
    guarantees this), making their contribution exactly zero.
    """

    def init_state(self, shape, dtype=jnp.float32):
        return {"product": jnp.zeros(shape, dtype)}

    def flush(self, ctx: Ctx, state, a, v):
        product = counted_matmul(ctx, a, v)
        return product, {"product": product}

    def incremental(
        self, ctx: Ctx, state, a_n_tilde, v_n_tilde, a_delta_tilde, v_delta_tilde, mask=None
    ):
        product = state["product"]
        frac = valid_fraction(mask)
        ctx.add("accumulator_flops", frac * float(v_n_tilde.size) + 2.0 * product.size)
        product = product + counted_matmul(ctx, a_n_tilde, v_delta_tilde, valid_frac=frac)
        product = product + counted_matmul(
            ctx, a_delta_tilde, v_n_tilde - v_delta_tilde, valid_frac=frac
        )
        return product, {"product": product}
