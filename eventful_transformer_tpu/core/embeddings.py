"""Position encodings (reference eventful_transformer/utils.py:32-195).

Both modules have a cheap derived quantity the reference caches on the module
(``cached_encoding``, ``y_relative``/``x_relative``, utils.py:55-63,151-156).
Here the equivalent is :meth:`precompute`, run once per model invocation
*outside* the frame scan so the work is hoisted out of the hot loop instead
of re-executed per frame.
"""

from __future__ import annotations

from math import prod

import jax.numpy as jnp

from eventful_transformer_tpu.core.nn import Module, counted_add, counted_einsum, trunc_normal
from eventful_transformer_tpu.ops.resize import avg_pool_1d, resize_bicubic, resize_bicubic_1d


class PositionEncoding(Module):
    """Learned absolute position encoding, bicubic-resized from
    ``encoding_size`` to ``input_size`` with a class-token carve-out
    (reference utils.py:32-105). The interpolation is deliberately not
    counted (utils.py:86-88)."""

    def __init__(self, dim, encoding_size, input_size, has_class_token):
        self.dim = dim
        self.encoding_size = tuple(encoding_size)
        self.input_size = tuple(input_size)
        self.has_class_token = has_class_token
        self.tokens = prod(self.encoding_size) + int(has_class_token)

    def init(self, key):
        return {"encoding": trunc_normal(key, (1, self.tokens, self.dim))}

    def precompute(self, params):
        """Resize the stored encoding to the input token grid."""
        encoding = params["encoding"]
        if self.input_size == self.encoding_size:
            return encoding
        if self.has_class_token:
            class_token, encoding = encoding[:, :1], encoding[:, 1:]
        else:
            class_token = None
        # (1, tokens, dim) -> (1, dim) + encoding_size
        encoding = jnp.swapaxes(encoding, 1, 2)
        encoding = encoding.reshape(encoding.shape[:-1] + self.encoding_size)
        if len(self.encoding_size) == 2:
            encoding = resize_bicubic(encoding, self.input_size)
        else:  # 1-D (temporal) encodings
            encoding = resize_bicubic_1d(encoding, self.input_size[0])
        encoding = encoding.reshape(encoding.shape[:2] + (-1,))
        encoding = jnp.swapaxes(encoding, 1, 2)
        if class_token is not None:
            encoding = jnp.concatenate([class_token, encoding], axis=1)
        return encoding

    def apply(self, ctx, params, x, sized_encoding=None):
        if sized_encoding is None:
            sized_encoding = self.precompute(params)
        return counted_add(ctx, x, sized_encoding.astype(x.dtype))


class RelativePositionEmbedding(Module):
    """Decomposed relative position embeddings, ViTDet-style
    (reference utils.py:108-195, after detectron2's add_decomposed_rel_pos)."""

    def __init__(self, attention_size, embedding_size, head_dim, pool_size=None):
        self.attention_size = tuple(attention_size)
        self.embedding_size = tuple(embedding_size)
        self.head_dim = head_dim
        self.pool_size = tuple(pool_size) if pool_size is not None else None

    def init(self, key):
        return {
            "y_embedding": jnp.zeros((2 * self.embedding_size[0] - 1, self.head_dim)),
            "x_embedding": jnp.zeros((2 * self.embedding_size[1] - 1, self.head_dim)),
        }

    def _get_relative(self, embedding, dim):
        """Build the (attention, pooled, head_dim) relative table for an axis
        (reference utils.py:175-189)."""
        size = self.embedding_size[dim]
        r0 = jnp.arange(size)[:, None]
        r1 = jnp.arange(size)[None, :]
        relative = embedding[r0 - r1 + size - 1]  # (S, S, c)
        if self.embedding_size != self.attention_size:
            # (S, S, c) -> (c, S, S) -> resize -> back, exactly as reference
            relative = jnp.transpose(relative, (2, 1, 0))[None]
            relative = resize_bicubic(relative, self.attention_size)
            relative = jnp.transpose(relative[0], (2, 1, 0))
        if self.pool_size is not None:
            relative = jnp.swapaxes(relative, 1, 2)
            relative = avg_pool_1d(relative, self.pool_size[dim])
            relative = jnp.swapaxes(relative, 1, 2)
        return relative

    # Combined per-token window table (t, p0 + p1, c) for the fused window
    # kernel's XLA-side term einsum: tab[n] = [y_relative[n // a1],
    # x_relative[n % a1]]. Precomputed (hoisted out of the frame scan —
    # the repeat/tile copies measured ~1 ms/frame at ViTDet-672 when built
    # per call) for small grids only: windows are 14x14=196 tokens; the
    # global grids (42x42/64x64) never take the window-kernel path.
    WINDOW_TAB_MAX_TOKENS = 512

    def precompute(self, params):
        derived = {
            "y_relative": self._get_relative(params["y_embedding"], dim=0),
            "x_relative": self._get_relative(params["x_embedding"], dim=1),
        }
        if self._use_flat_matmul():
            derived.update(self._precompute_flat(derived))
        a = self.attention_size
        if self.pool_size is None and prod(a) <= self.WINDOW_TAB_MAX_TOKENS:
            derived["window_tab"] = jnp.concatenate(
                [
                    jnp.repeat(derived["y_relative"], a[1], axis=0),
                    jnp.tile(derived["x_relative"], (a[0], 1, 1)),
                ],
                axis=1,
            )
        return derived

    def _pooled_size(self):
        a = self.attention_size
        if self.pool_size is None:
            return a
        return (a[0] // self.pool_size[0], a[1] // self.pool_size[1])

    def _precompute_flat(self, derived):
        """Static operands for the flat-matmul bias path (see apply).

        ``y_flat``/``x_flat``: the per-axis tables flattened to c-minor
        (a·p, c) matrices. ``y_extract``/``x_extract``: 0/1 matrices that
        extract the block-diagonal entries of q @ flatᵀ and expand them to
        the flat key axis in one matmul."""
        a = self.attention_size
        p = self._pooled_size()
        n = jnp.arange(prod(a))
        y_rel = derived["y_relative"]  # (a0, p0, c)
        x_rel = derived["x_relative"]  # (a1, p1, c)
        j_y = jnp.arange(a[0] * p[0])
        j_x = jnp.arange(a[1] * p[1])
        #   term_y[n, k0] = (q @ y_flatᵀ)[n, (y(n), k0)]
        # = Σ_j ((q @ y_flatᵀ) ⊙ mask_y)[n, j] · K_y[j, k0]
        # with mask_y[n, j] = (n // a1 == j // p0) and
        #      K_y[j, k0]   = (j % p0 == k0):
        # exactly ONE nonzero j = (y(n), k0) survives per output element, so
        # the collapse matmul is an exact row copy at any dtype.
        return {
            "y_flat": y_rel.reshape(-1, y_rel.shape[-1]),
            "x_flat": x_rel.reshape(-1, x_rel.shape[-1]),
            "y_mask": (n[:, None] // a[1] == j_y[None, :] // p[0]),
            "x_mask": (n[:, None] % a[1] == j_x[None, :] // p[1]),
            "y_collapse": (j_y[:, None] % p[0] == jnp.arange(p[0])[None, :]),
            "x_collapse": (j_x[:, None] % p[1] == jnp.arange(p[1])[None, :]),
        }

    def _flat_terms(self, ctx, q, derived, a, p, dtype):
        """The per-axis bias terms without 5/6-D views (see _precompute_flat;
        motivation in the TPU layout note below): one dense q @ tableᵀ
        product per axis + an exact static masked-collapse matmul. Count
        parity: the reference path's two einsums (out.size * c each)."""
        import jax

        c = q.shape[-1]
        prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
        terms = []
        for axis in ("y", "x"):
            flat = derived[f"{axis}_flat"].astype(dtype)  # (a*p, c)
            full = jnp.matmul(q, flat.T, preferred_element_type=dtype)
            masked = full * derived[f"{axis}_mask"].astype(dtype)
            term = jnp.matmul(
                masked,
                derived[f"{axis}_collapse"].astype(dtype),
                preferred_element_type=dtype,
                precision=prec,
            )
            terms.append(term)
            ctx.add("einsum_flops", term.size * c)
        return terms

    # Fused bias+add kernel (ops/pallas/relpos.py):
    #   "v2"   — the flat-layout row-block kernel (interpret off-TPU, for
    #            tests). Default OFF after measurement: although the v2
    #            kernel fixed the stripe kernel's serialization, it STILL
    #            lost to the XLA paths end-to-end (dense-1024 44.7 -> 48.5
    #            ms/frame) because XLA already fuses the bias ADD into the
    #            softmax pass — a standalone bias kernel only adds a
    #            materialization boundary. The production fusion home for
    #            the bias is inside the A·V kernel (ops/pallas/av_softmax),
    #            which already sits at that boundary.
    #   True   — force the original stripe kernel (first recorded negative
    #            result: its per-stripe python loop serialized small
    #            matmuls, 2x slower than XLA end-to-end);
    #   "auto"/False — the XLA flat-expander / einsum paths (production).
    use_pallas_kernel = False

    def _use_kernel(self):
        if self.use_pallas_kernel in (True, "v2"):
            return "v2" if self.use_pallas_kernel == "v2" else "v1"
        return False

    # Flat-matmul bias path (see apply): "auto" enables on TPU for small
    # per-axis tables; True forces (for parity tests off-TPU); False always
    # uses the einsum path.
    use_flat_matmul = "auto"
    # Per-shape dispatch, measured (docs/PERF_NOTES.md): the flat path wins
    # where the einsum's 5-D minor dims are badly tile-padded — windows
    # (14x14) and the pooled 672 global case (a*p = 42*21=882) — and LOSES
    # where they are mild and its dense q @ tableT FLOPs dominate
    # (1024 global: a*p = 64*32=2048, dense 45.9 -> 53.9 ms/frame).
    FLAT_MAX_TABLE = 1024

    def _use_flat_matmul(self):
        if self.use_flat_matmul is True:
            return True
        if self.use_flat_matmul != "auto":
            return False
        a = self.attention_size
        p = self._pooled_size()
        if max(a[0] * p[0], a[1] * p[1]) > self.FLAT_MAX_TABLE:
            return False
        try:
            import jax

            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    def bias_terms(self, ctx, q, derived):
        """(B, H, N, p0 + p1) decomposed per-axis bias terms on the flat
        token axis — the XLA-side half of the fused-bias A·V kernel
        (ops/pallas/av_softmax): the kernel expands these onto the (N, Np)
        logits with an exact 0/1 matmul in VMEM, so the full bias never
        exists in HBM. Same einsum count keys/values as the reference's two
        term einsums (utils.py:157-166)."""
        a = self.attention_size
        p = self._pooled_size()
        dtype = q.dtype
        if self._use_flat_matmul() and "y_flat" in derived:
            term_y, term_x = self._flat_terms(ctx, q, derived, a, p, dtype)
        else:
            bsz, heads = q.shape[:2]
            q5 = q.reshape(q.shape[:2] + a + q.shape[-1:])
            y_rel = derived["y_relative"].astype(dtype)
            x_rel = derived["x_relative"].astype(dtype)
            c = q.shape[-1]
            term_y = counted_einsum(ctx, "abhwc,hkc->abhwk", q5, y_rel, c)
            term_x = counted_einsum(ctx, "abhwc,wkc->abhwk", q5, x_rel, c)
            term_y = term_y.reshape(bsz, heads, -1, p[0])
            term_x = term_x.reshape(bsz, heads, -1, p[1])
        return jnp.concatenate([term_y, term_x], axis=-1)

    def apply(self, ctx, params, x, q, derived=None):
        """Add decomposed relative position terms to attention logits x
        (reference utils.py:139-171). x: (batch, heads, N, Np); q: (batch,
        heads, N, c).

        TPU layout note: the reference formulation broadcast-adds the terms
        on a 6-D (batch, heads, a0, a1, p0, p1) view. On TPU the two MINOR
        dims of every materialized array are padded to the (8, 128) vector
        tile, so with a1/p1 = 14 (windows) or 42 (global 672) that view
        inflates HBM traffic up to ~9x — measured 40 ms/frame of the 49 ms
        ViTDet-672 dense backbone. Instead the per-axis terms are expanded
        to the flat key axis with exact 0/1 expander matmuls (single-nonzero
        MXU row copies, bit-exact at any precision) and added in the
        well-tiled flat (batch, heads, N, Np) layout."""
        if derived is None:
            derived = self.precompute(params)
        a = self.attention_size
        if self.pool_size is None:
            p = a
        else:
            p = (a[0] // self.pool_size[0], a[1] // self.pool_size[1])
        dtype = x.dtype
        c = q.shape[-1]
        n, np_ = prod(a), prod(p)
        kernel = self._use_kernel()
        if kernel and x.ndim == 4 and x.shape[-2] == n:
            import jax

            from eventful_transformer_tpu.ops.pallas.relpos import (
                relpos_bias_add,
                relpos_bias_add_v2,
            )

            fn = relpos_bias_add_v2 if kernel == "v2" else relpos_bias_add
            # reference-parity counts: two term einsums + two adds
            ctx.add("einsum_flops", 2 * x.shape[0] * x.shape[1] * n * c * (p[0] + p[1]) / 2)
            ctx.add("add_flops", 2 * x.size)
            return fn(
                x, q, derived["y_relative"], derived["x_relative"], a=a, p=p,
                interpret=jax.devices()[0].platform == "cpu",
            )
        bsz, heads = x.shape[:2]
        if self._use_flat_matmul() and "y_flat" in (derived or {}):
            term_y, term_x = self._flat_terms(ctx, q, derived, a, p, dtype)
        else:
            q = q.reshape(q.shape[:2] + a + q.shape[-1:])  # (B, H, a0, a1, c)
            y_rel = derived["y_relative"].astype(dtype)  # (a0, p0, c)
            x_rel = derived["x_relative"].astype(dtype)  # (a1, p1, c)
            term_y = counted_einsum(ctx, "abhwc,hkc->abhwk", q, y_rel, c)
            term_x = counted_einsum(ctx, "abhwc,wkc->abhwk", q, x_rel, c)
            term_y = term_y.reshape(bsz, heads, n, p[0])
            term_x = term_x.reshape(bsz, heads, n, p[1])
        k_idx = jnp.arange(np_)
        e_y = (k_idx[None, :] // p[1] == jnp.arange(p[0])[:, None]).astype(dtype)
        e_x = (k_idx[None, :] % p[1] == jnp.arange(p[1])[:, None]).astype(dtype)
        # one stacked expander matmul computes ty + tx directly (each output
        # element sums exactly one y term and one x term). NOTE an axis-major
        # reformulation of the term einsums (batching each contraction over
        # its own leading axis + explicit transposes) measured 2x WORSE than
        # letting XLA handle the middle-batched einsum — the input-side q
        # transposes copy in c-sized (128 B) chunks.
        term = jnp.concatenate([term_y, term_x], axis=-1)  # (B, H, N, p0+p1)
        e = jnp.concatenate([e_y, e_x], axis=0)  # (p0+p1, Np)
        t = jnp.matmul(term, e, preferred_element_type=dtype)
        # same count keys/values as the reference's two broadcast adds
        ctx.add("add_flops", x.size)
        return counted_add(ctx, x, t)
