"""Transformer blocks: dense and eventful variants.

Re-design of eventful_transformer/blocks.py for TPU/XLA:

  * Temporal state is an explicit pytree threaded through ``apply``; the
    reference's six per-module ``first`` flags per block collapse into ONE
    ``lax.cond`` per block (all submodules reset together, base.py:130, so
    flush/incremental structure is identical).
  * All shapes are static. Variable-k selection (threshold policies,
    pooled-index dedup via ``.unique()``, blocks.py:539) becomes fixed
    capacity + validity mask; FLOP counts are mask-scaled so reported numbers
    match the reference's variable-k accounting.
  * Windows ride the batch axis (as in the reference, blocks.py:290-299) —
    batched MXU matmuls, no per-window loops.
  * ATS index stabilization (blocks.py:378-391, a CPU loop in the reference)
    is reformulated as a vectorized static-shape merge.

Block classes (matching reference names so configs select them by string,
backbones.py:58):
  Block                   — dense pre-LN ViT block (blocks.py:26-396)
  EventfulTokenwiseBlock  — gates token-wise ops (blocks.py:399-463)
  EventfulMatmul1Block    — + incremental q·kᵀ (blocks.py:466-540)
  EventfulBlock           — + delta-based A·V (blocks.py:543-575)
"""

from __future__ import annotations

from math import prod, sqrt

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.core import counting
from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.core.embeddings import RelativePositionEmbedding
from eventful_transformer_tpu.core.gating import (
    MatmulBuffer,
    MatmulDeltaAccumulator,
    SimpleSTGTGate,
    TokenBuffer,
    TokenDeltaGate,
    TokenGate,
)
from eventful_transformer_tpu.core.indexing import take_rows, valid_fraction
from eventful_transformer_tpu.core.nn import (
    DropPath,
    Linear,
    Module,
    counted_add,
    counted_matmul,
    gelu,
    layer_norm,
    numeric_tuple,
)

LN_EPS = 1e-6  # reference blocks.py:23

_CAST_DTYPES = {"float16": jnp.float16, "bfloat16": jnp.bfloat16}


class Block(Module):
    """Dense pre-LN Transformer block with windowed attention, self-attention
    pooling, relative position embeddings, ATS and matmul-2 casting
    (reference blocks.py:26-396)."""

    def __init__(
        self,
        dim,
        heads,
        input_size,
        mlp_ratio,
        ats_fraction=None,
        drop_path_rate=0.0,
        relative_embedding_size=None,
        matmul_2_cast=None,
        pool_size=None,
        window_size=None,
        sequence_parallel=None,
    ):
        self.dim = dim
        self.heads = heads
        self.input_size = tuple(input_size)
        self.mlp_ratio = mlp_ratio
        if ats_fraction is not None:
            assert pool_size is None and window_size is None
            assert 0.0 <= ats_fraction <= 1.0
        assert 0.0 <= drop_path_rate <= 1.0
        assert matmul_2_cast in (None, "float16", "bfloat16")
        if sequence_parallel is not None:
            # Ulysses sequence parallelism covers the global-attention
            # configuration (the one that grows with N); windows/pooling/
            # rel-pos/ATS keep attention local or data-dependent and stay
            # single-shard (SURVEY.md §5 long-context row). Token-GATED
            # blocks are excluded too: a top-k policy under token sharding
            # selects k tokens PER SHARD (P*k globally), which is a
            # different selection set than the unsharded reference — the
            # exactness claim only holds for the dense Block.
            assert type(self) is Block, (
                "sequence_parallel requires the dense Block: top-k gates "
                "select per-shard under token sharding"
            )
            assert window_size is None and pool_size is None
            assert relative_embedding_size is None and ats_fraction is None
        self.sequence_parallel = sequence_parallel
        self.ats_fraction = ats_fraction
        self.matmul_2_cast = matmul_2_cast
        self.pool_size = None if pool_size is None else numeric_tuple(pool_size, 2)
        if window_size is None:
            self.window_size = None
            attention_size = self.input_size
        else:
            self.window_size = numeric_tuple(window_size, 2)
            attention_size = self.window_size
            if relative_embedding_size is not None:
                relative_embedding_size = self.window_size
        self.scale = sqrt(dim // heads)

        self.qkv = Linear(dim, dim * 3)
        self.projection = Linear(dim, dim)
        self.mlp_1 = Linear(dim, dim * mlp_ratio)
        self.mlp_2 = Linear(dim * mlp_ratio, dim)
        self.drop_path = DropPath(drop_path_rate)
        if relative_embedding_size is not None:
            self.relative_position = RelativePositionEmbedding(
                attention_size,
                relative_embedding_size,
                dim // heads,
                pool_size=self.pool_size,
            )
        else:
            self.relative_position = None

    # -- parameter / state construction ------------------------------------

    def init(self, key):
        modules = {
            "qkv": self.qkv,
            "projection": self.projection,
            "mlp_1": self.mlp_1,
            "mlp_2": self.mlp_2,
        }
        if self.relative_position is not None:
            modules["relative_position"] = self.relative_position
        params = self.sub_init(key, modules)
        params["input_layer_norm"] = {
            "scale": jnp.ones((self.dim,)),
            "bias": jnp.zeros((self.dim,)),
        }
        params["mlp_layer_norm"] = {
            "scale": jnp.ones((self.dim,)),
            "bias": jnp.zeros((self.dim,)),
        }
        return params

    def n_select(self, n_tokens):
        """ATS output token count (+1 for the class token, blocks.py:165)."""
        return int(self.ats_fraction * (n_tokens - 1)) + 1

    def out_tokens(self, n_tokens):
        return n_tokens if self.ats_fraction is None else self.n_select(n_tokens)

    def init_state(self, batch, n_tokens, dtype=jnp.float32):
        if self.ats_fraction is None:
            return {}
        ns = self.n_select(n_tokens)
        return {
            "ats_last": jnp.zeros((batch, ns), jnp.int32),
            "ats_has_last": jnp.zeros((), bool),
        }

    def precompute(self, params):
        """Derived quantities hoisted out of the frame scan (the functional
        analog of the reference's cached y_relative/x_relative)."""
        if self.relative_position is None:
            return {}
        aux = {
            "relative": self.relative_position.precompute(
                params["relative_position"]
            )
        }
        if self.window_size is not None and any(self._compute_window_padding()):
            # Pad-row (qkv-bias-row) bias terms for the fused window kernel:
            # a function of params only, hoisted out of the frame scan.
            from eventful_transformer_tpu.ops.pallas.window_attention import (
                window_bias_pad_terms,
            )

            pad_bias = params["qkv"]["bias"]
            aux["window_pad_terms"] = window_bias_pad_terms(
                pad_bias,
                aux["relative"]["y_relative"],
                aux["relative"]["x_relative"],
                self.heads,
                pad_bias.dtype,
                tab=aux["relative"].get("window_tab"),
            )
        return aux

    # -- forward ------------------------------------------------------------

    # Fused LN+MLP+residual kernel for the dense path (ops/pallas/dense_mlp):
    # "auto" enables on TPU at inference; True forces (interpret off-TPU).
    fused_dense_mlp = "auto"

    def _use_dense_mlp_kernel(self, ctx):
        if self.fused_dense_mlp is True:
            return True
        # training needs gradients: pallas_call has no VJP here
        if self.fused_dense_mlp != "auto" or ctx.training:
            return False
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    def apply(self, ctx: Ctx, params, state, x, aux=None, mode=None):
        # ``mode`` (flush/incremental) is meaningful only for stateful
        # (eventful) blocks; the dense block is frame-independent.
        del mode
        skip_1 = x
        x = layer_norm(x, params["input_layer_norm"], LN_EPS)
        x = self.qkv.apply(ctx, params["qkv"], x)
        x, ats_indices, state = self._forward_attention(ctx, params, state, x, aux)
        skip_1 = self._gather_ats_skip(skip_1, ats_indices)
        x = self.projection.apply(ctx, params["projection"], x)
        x = counted_add(ctx, self.drop_path.apply(ctx, None, x), skip_1)
        if self._use_dense_mlp_kernel(ctx):
            from eventful_transformer_tpu.ops.pallas.dense_mlp import (
                dense_mlp_residual,
            )

            interpret = jax.devices()[0].platform == "cpu"
            ln = params["mlp_layer_norm"]
            y = dense_mlp_residual(
                x, ln["scale"], ln["bias"],
                params["mlp_1"]["kernel"], params["mlp_1"]["bias"],
                params["mlp_2"]["kernel"], params["mlp_2"]["bias"],
                interpret=interpret,
            )
            # reference-parity counts for the fused LN+MLP+add
            rows = x.size // x.shape[-1]
            hidden = self.mlp_1.out_features
            ctx.add("linear_flops", float(x.size * hidden))
            ctx.add("bias_flops", float(rows * hidden))
            ctx.add("linear_flops", float(rows * hidden * self.mlp_2.out_features))
            ctx.add("bias_flops", float(rows * self.mlp_2.out_features))
            ctx.add("add_flops", float(y.size))
            return y, state
        skip_2 = x
        x = layer_norm(x, params["mlp_layer_norm"], LN_EPS)
        x = self._forward_mlp(ctx, params, x)
        x = counted_add(ctx, self.drop_path.apply(ctx, None, x), skip_2)
        return x, state

    # Fused windowed attention kernel (ops/pallas/window_attention): "auto"
    # enables on TPU at inference for windowed/no-pool/no-ATS/no-cast blocks
    # (every ViTDet windowed block, dense AND eventful-tokenwise); True
    # forces (interpret off-TPU, for parity tests).
    fused_window_attention = "auto"

    def _use_window_attention_kernel(self, ctx):
        if (
            self.window_size is None
            or self.pool_size is not None
            or self.ats_fraction is not None
            or self.matmul_2_cast is not None
        ):
            return False
        # training needs gradients: pallas_call has no VJP here — checked
        # BEFORE honoring True, like _use_av_kernel, so a force-enabled
        # block still falls back to the XLA path under a train step.
        if ctx.training:
            return False
        if self.fused_window_attention is True:
            return True
        if self.fused_window_attention != "auto":
            return False
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    # Fused GLOBAL attention for small token counts (ViViT's spatial N=197
    # and temporal N=17): the same one-VMEM-pass attention as the windowed
    # kernel, with the whole sequence as a single "window" per batch row.
    # Replaces the XLA head-split transposes + three HBM round-trips of the
    # (B, H, N, N) logits. Applies to the dense Block AND the eventful
    # tokenwise blocks (whose attention runs dense on the full buffer);
    # excluded whenever pooling / ATS / matmul-2 cast / rel-pos change the
    # attention structure (reference blocks.py:205-246 plain path only).
    fused_global_attention = "auto"
    GLOBAL_ATTN_MAX_TOKENS = 512  # per-instance logits must fit VMEM
    # Per-grid-instance VMEM bound for the auto path: the qkv block
    # (t, 3C), the (t, C) output and the per-head f32 logits (t, t) must
    # coexist in VMEM alongside Mosaic's own scratch. 8 MB of the v5e's
    # 16 MB per-core VMEM leaves comfortable headroom; a raw token cap
    # alone would admit a 512-token block with a wide channel dim whose
    # qkv slab exceeds VMEM.
    GLOBAL_ATTN_MAX_BYTES = 8 * 1024 * 1024

    def _use_global_attention_kernel(self, ctx, x):
        if (
            self.window_size is not None
            or self.pool_size is not None
            or self.ats_fraction is not None
            or self.matmul_2_cast is not None
            or self.relative_position is not None
        ):
            return False
        if ctx.training:  # pallas_call has no VJP here
            return False
        if self.fused_global_attention is True:
            return True
        if self.fused_global_attention != "auto":
            return False
        n_tokens = x.shape[-2]
        if n_tokens > self.GLOBAL_ATTN_MAX_TOKENS:
            return False
        itemsize = jnp.dtype(x.dtype).itemsize
        est_bytes = (
            n_tokens * 3 * self.dim * itemsize  # qkv input block
            + n_tokens * self.dim * itemsize  # output block
            + n_tokens * n_tokens * 4  # per-head f32 logits
        )
        if est_bytes > self.GLOBAL_ATTN_MAX_BYTES:
            return False
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    # Window partition/recombine as STATIC row gathers instead of the
    # pad -> 6-D reshape -> transpose chain (whose layout copies profiled
    # ~2.2 ms/frame at ViTDet-1024). MEASURED NEGATIVE on TPU v5e
    # (round 4): the static-index row gather lowers far worse than the
    # transpose chain — ViTDet-1024 dense 41.9 -> 46.2 ms/frame, eventful
    # 22.7 -> 27.3. XLA's window transposes are already near the copy
    # floor; a gather adds per-row addressed DMA. Kept as a tested option
    # (parity test in tests/test_pallas.py); default OFF.
    window_partition_gather = False

    def _use_window_gather(self, ctx):
        if self.window_partition_gather is False or ctx.training:
            return False
        if self.window_partition_gather is True:
            return True
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    def _window_perm(self):
        """(perm, inv): static index maps between row-major tokens and
        window-major positions. perm (NwT,) holds the row-major row for
        each window-major position, with pad positions -> h*w (the
        appended zero row); inv (h*w,) holds each row-major token's
        window-major position."""
        cached = getattr(self, "_window_perm_cache", None)
        if cached is not None:
            return cached
        import numpy as _np

        p = self._compute_window_padding()
        d = self.window_size
        h, w = self.input_size
        hp, wp = h + p[0], w + p[1]
        rowmajor = _np.full((hp, wp), h * w, dtype=_np.int32)
        rowmajor[:h, :w] = _np.arange(h * w, dtype=_np.int32).reshape(h, w)
        perm = (
            rowmajor.reshape(hp // d[0], d[0], wp // d[1], d[1])
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        inv = _np.zeros(h * w, dtype=_np.int32)
        valid = perm < h * w
        inv[perm[valid]] = _np.nonzero(valid)[0].astype(_np.int32)
        # cache HOST arrays: a jnp constant created inside one jit trace
        # must not be reused in another (UnexpectedTracerError)
        self._window_perm_cache = (perm, inv)
        return self._window_perm_cache

    def _partition_windows_zero(self, ctx, params, x):
        """Partition for the fused kernel: ZERO-pad the spatial map (a
        cheap XLA pad the producer fuses into, vs. the full-bias-map
        broadcast+set of _partition_windows that cost ~0.6 ms/frame at
        ViTDet-1024) and hand the kernel the qkv-bias row + window
        geometry so out-of-image tokens are substituted in-VMEM. Exact
        same semantics (reference blocks.py:269-287)."""
        p = self._compute_window_padding()
        d = self.window_size
        b, _, c = x.shape
        h, w = self.input_size
        pad_bias, geom = None, None
        if any(p):
            pad_vec = self.qkv.apply_bias(
                ctx, params["qkv"], jnp.zeros((1, 1, 1, c), x.dtype)
            )
            pad_bias = pad_vec.reshape(c)
            geom = ((h + p[0]) // d[0], (w + p[1]) // d[1], h, w)
        if self._use_window_gather(ctx):
            perm, _ = self._window_perm()
            if any(p):
                x = jnp.concatenate(
                    [x, jnp.zeros((b, 1, c), x.dtype)], axis=1
                )
            xw = jnp.take(x, perm, axis=1)
            return xw.reshape(-1, d[0] * d[1], c), pad_bias, geom
        x = x.reshape(b, h, w, c)
        if any(p):
            x = jnp.pad(x, ((0, 0), (0, p[0]), (0, p[1]), (0, 0)))
            h, w = h + p[0], w + p[1]
        x = x.reshape(b, h // d[0], d[0], w // d[1], d[1], c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(-1, d[0] * d[1], c), pad_bias, geom

    def _window_attention_fused(self, ctx, params, x, aux, pad_bias=None,
                                geom=None):
        """x (Bw, T, 3C) window-partitioned qkv -> (Bw, T, C); FLOP counts
        mirror the XLA path's exactly (counted matmul-1/matmul-2 + the
        flat-bias term einsums + the two bias adds). Partitioning stays in
        XLA: the grid-stripe kernel variant that slices windows in VMEM
        (window_attention_grid) measured SLOWER end-to-end — see its
        docstring for the recorded negative result."""
        from eventful_transformer_tpu.ops.pallas.window_attention import (
            window_attention,
            window_bias_pad_terms,
            window_bias_terms,
        )

        interpret = jax.devices()[0].platform == "cpu"
        bw, t, _ = x.shape
        d = self.dim // self.heads
        if self.relative_position is not None:
            rp = self.relative_position
            derived = (aux.get("relative") if aux else None) or rp.precompute(
                params["relative_position"]
            )
            p_sz = rp._pooled_size()
            # Bias terms contracted here in XLA (one thin einsum over the
            # packed qkv's q lanes); the kernel expands them in VMEM. The
            # per-token table and the pad-row terms come precomputed from
            # aux (loop-invariant; built here only on the direct-call path).
            terms = window_bias_terms(
                x, derived["y_relative"], derived["x_relative"], self.heads,
                tab=derived.get("window_tab"),
            )
            pad_terms = None
            if geom is not None:
                pad_terms = (aux or {}).get("window_pad_terms")
                if pad_terms is None:
                    pad_terms = window_bias_pad_terms(
                        pad_bias, derived["y_relative"], derived["x_relative"],
                        self.heads, x.dtype,
                    )
                pad_terms = pad_terms.astype(x.dtype)
            out = window_attention(
                x, terms, pad_bias, pad_terms,
                heads=self.heads, scale=self.scale, a=rp.attention_size,
                p=p_sz, geom=geom, interpret=interpret,
            )
            ctx.add(
                "einsum_flops",
                float(bw * self.heads * t * (p_sz[0] + p_sz[1]) * d),
            )
            ctx.add("add_flops", 2.0 * bw * self.heads * t * t)
        else:
            # window_size None = fused GLOBAL attention: the whole sequence
            # is a single "window" per batch row (same kernel, no geometry).
            out = window_attention(
                x, None, pad_bias, heads=self.heads, scale=self.scale,
                a=tuple(self.window_size) if self.window_size else None,
                geom=geom, interpret=interpret,
            )
        ctx.add("matmul_flops", 2.0 * bw * self.heads * t * t * d)
        return out

    def _forward_attention(self, ctx, params, state, x, aux,
                           pre_partitioned=False):
        if self.sequence_parallel is not None:
            return self._attention_ulysses(ctx, x), None, state
        if pre_partitioned:
            # x (B, NW, 3C) window-major resident qkv (pad rows hold the
            # qkv bias row already): partition is a free reshape. Count
            # the pad-bias map exactly as the relayout paths do
            # (_partition_windows / _partition_windows_zero both apply
            # the counted bias to a (1, 1, 1, 3C) zero row).
            t = self.window_size[0] * self.window_size[1]
            x = x.reshape(-1, t, x.shape[-1])
            if any(self._compute_window_padding()):
                self.qkv.apply_bias(
                    ctx, params["qkv"],
                    jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype),
                )
        if self._use_window_attention_kernel(ctx):
            if not pre_partitioned:
                x, pad_bias, geom = self._partition_windows_zero(ctx, params, x)
            else:
                pad_bias, geom = None, None
            x = self._window_attention_fused(ctx, params, x, aux, pad_bias, geom)
            return self._recombine_windows(x, ctx), None, state
        if not pre_partitioned and self._use_global_attention_kernel(ctx, x):
            out = self._window_attention_fused(ctx, params, x, aux)
            return out, None, state
        if not pre_partitioned:
            x = self._partition_windows(ctx, params, x, in_qkv_domain=True)
        q, k, v = self._partition_heads(x)
        k = self._pool_tokens(k)
        v = self._pool_tokens(v)
        # Scale q, not the (much larger) product (reference blocks.py:220-223).
        a = counted_matmul(ctx, q / self.scale, jnp.swapaxes(k, -2, -1))
        if self.relative_position is not None:
            derived = aux.get("relative") if aux else None
            a = self.relative_position.apply(
                ctx, params["relative_position"], a, q, derived=derived
            )
        a = jax.nn.softmax(a, axis=-1)
        a, ats_indices, state = self._adaptive_token_sampling(state, a, v)
        a, v, old_dtype = self._cast_matmul_2(a, v)
        x = counted_matmul(ctx, a, v)
        x = self._recombine_heads(x)
        x = self._recombine_windows(x, ctx)
        x = self._uncast_matmul_2(x, old_dtype)
        return x, ats_indices, state

    def _attention_ulysses(self, ctx, x):
        """Ulysses sequence-parallel attention (parallel/sequence.py design):
        must run inside a ``shard_map`` whose ``sequence_parallel`` mesh axis
        shards the token dimension. qkv arrives token-sharded (B, N/P, 3C);
        two all-to-alls trade tokens for heads so each shard computes EXACT
        attention for heads/P heads over the full sequence. Bit-identical to
        the single-device path (same matmul shapes per head, same softmax
        rows). FLOP counts are per shard under SP.
        """
        axis = self.sequence_parallel
        b, n_local, c3 = x.shape
        head_dim = c3 // (3 * self.heads)
        x = x.reshape(b, n_local, 3, self.heads, head_dim)
        # tokens <-> heads: gather the FULL sequence for heads/P local heads
        x = jax.lax.all_to_all(x, axis, split_axis=3, concat_axis=1, tiled=True)
        q, k, v = jnp.moveaxis(x, 2, 0)  # (B, N, H/P, D) each
        q = jnp.swapaxes(q, 1, 2)  # (B, H/P, N, D)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        a = counted_matmul(ctx, q / self.scale, jnp.swapaxes(k, -2, -1))
        a = jax.nn.softmax(a, axis=-1)
        a, v, old_dtype = self._cast_matmul_2(a, v)
        o = counted_matmul(ctx, a, v)
        o = self._uncast_matmul_2(o, old_dtype)
        o = jnp.swapaxes(o, 1, 2)  # (B, N, H/P, D)
        o = jax.lax.all_to_all(o, axis, split_axis=1, concat_axis=2, tiled=True)
        return o.reshape(b, n_local, self.heads * head_dim)

    def _forward_mlp(self, ctx, params, x, valid_frac=1):
        x = self.mlp_1.apply(ctx, params["mlp_1"], x, valid_frac)
        x = gelu(x)
        x = self.mlp_2.apply(ctx, params["mlp_2"], x, valid_frac)
        return x

    # -- heads / windows / pooling -------------------------------------------

    def _partition_heads(self, x):
        b, n = x.shape[:2]
        x = x.reshape(b, n, 3, self.heads, x.shape[-1] // (3 * self.heads))
        q, k, v = jnp.transpose(x, (2, 0, 3, 1, 4))
        return q, k, v

    @staticmethod
    def _recombine_heads(x):
        b, h, n, c = x.shape
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * c)

    def _compute_window_padding(self):
        pad_h = -self.input_size[0] % self.window_size[0]
        pad_w = -self.input_size[1] % self.window_size[1]
        return pad_h, pad_w

    def _partition_windows(self, ctx, params, x, in_qkv_domain):
        if self.window_size is None:
            return x
        p = self._compute_window_padding()
        d = self.window_size
        b, _, c = x.shape
        h, w = self.input_size
        x = x.reshape(b, h, w, c)
        if any(p):
            # Padded tokens must equal qkv(0) = qkv bias when x is already in
            # the QKV domain (reference blocks.py:269-287).
            pad_vec = jnp.zeros((1, 1, 1, c), x.dtype)
            if in_qkv_domain:
                pad_vec = self.qkv.apply_bias(ctx, params["qkv"], pad_vec)
            padded = jnp.broadcast_to(pad_vec, (b, h + p[0], w + p[1], c))
            x = padded.at[:, :h, :w].set(x)
            h, w = h + p[0], w + p[1]
        x = x.reshape(b, h // d[0], d[0], w // d[1], d[1], c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(-1, d[0] * d[1], c)

    def _recombine_windows(self, x, ctx=None):
        if self.window_size is None:
            return x
        p = self._compute_window_padding()
        d = self.window_size
        s = self.input_size
        c = x.shape[-1]
        if ctx is not None and self._use_window_gather(ctx):
            # inverse of the partition gather: one major-axis row gather
            # drops pad positions and restores row-major token order
            _, inv = self._window_perm()
            n_win = ((s[0] + p[0]) // d[0]) * ((s[1] + p[1]) // d[1])
            y = x.reshape(-1, n_win * d[0] * d[1], c)
            return jnp.take(y, inv, axis=1)
        total_h, total_w = p[0] + s[0], p[1] + s[1]
        x = x.reshape(-1, total_h // d[0], total_w // d[1], d[0], d[1], c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        x = x.reshape(-1, total_h, total_w, c)
        if any(p):
            x = x[:, : s[0], : s[1]]
        return x.reshape(x.shape[0], s[0] * s[1], c)

    # k/v pooling formulation: "strided" sums the ph*pw strided slices of
    # the token grid (pure VPU adds, one pass, f32-accumulated); "matmul"
    # is the round-2 pool-matrix matmul; "auto" picks matmul on TPU.
    # Strided looked ~1.15 ms/frame cheaper in an isolated profile at
    # ViTDet-1024, but regressed the full backbone 22.95 -> 27.0 ms/frame
    # (1.83x -> 1.55x vs dense): the ph*pw strided slices have minor dims
    # of w/pw (badly tile-padded relayouts XLA can't fuse away), whereas
    # the pool matmul stays in the standard (N, C) layout and overlaps
    # with neighbouring MXU work. Measured negative result — kept as an
    # explicit option, never auto-selected.
    pool_mode = "auto"

    def _pool_tokens(self, x):
        if self.pool_size is None:
            return x
        w = self.input_size if self.window_size is None else self.window_size
        b, h, _, c = x.shape
        ph, pw = self.pool_size
        pool_elems = ph * pw
        if (
            self.pool_mode == "strided"
            and w[0] % ph == 0
            and w[1] % pw == 0
        ):
            g = x.reshape(b, h, w[0], w[1], c).astype(jnp.float32)
            acc = None
            for i in range(ph):
                for j in range(pw):
                    part = g[:, :, i::ph, j::pw]
                    acc = part if acc is None else acc + part
            y = (acc * (1.0 / pool_elems)).astype(x.dtype)
            return y.reshape(b, h, -1, c)
        if self._pool_by_matmul() and (pool_elems & (pool_elems - 1)) == 0:
            # Average pooling as one matmul with a static 0/mean-weight
            # matrix: the 6-D reshape+mean view has minor dims of w/p
            # (badly tile-padded — profiled ~160 us/block at ViTDet-672);
            # the matmul runs in the standard (N, C) layout. Exact ONLY for
            # power-of-two pools (1/(ph*pw) is then a power of two, so the
            # weighted f32-accumulated sums round identically to the mean) —
            # non-power-of-two pools fall through to reshape+mean. f32
            # operands need HIGHEST precision: DEFAULT runs the MXU through
            # bf16 passes, quantizing the copies (same rule as
            # indexing._take_cols_onehot).
            prec = (
                jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
            )
            return jnp.matmul(
                _pool_matrix(w, (ph, pw), x.dtype), x,
                preferred_element_type=x.dtype, precision=prec,
            )
        y = x.reshape(-1, w[0] // ph, ph, w[1] // pw, pw, c).mean(axis=(2, 4))
        return y.reshape(b, h, -1, c)

    def _pool_by_matmul(self):
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    # -- ATS ------------------------------------------------------------------

    def _adaptive_token_sampling(self, state, a, v):
        """Top-k ATS (Fayyaz et al. 2022) with sorted-index stabilization
        (reference blocks.py:150-181). Returns (a_gathered, indices, state)."""
        if self.ats_fraction is None:
            return a, None, state
        class_scores = a[..., 0]
        raw_scores = class_scores * jnp.linalg.norm(v, axis=-1)
        scores = raw_scores / jnp.sum(raw_scores[..., 1:], axis=-1, keepdims=True)
        scores = scores.at[..., 0].set(jnp.inf)  # always keep the class token
        # Sum scores over heads -> (batch, tokens). NOTE: the reference's
        # ``scores.sum(dim=-3)`` (blocks.py:163) reduces the BATCH/VIEW axis
        # of its 3-D scores — numerically valid only because its configs use
        # 12 views == 12 heads; we implement the intended head reduction.
        scores = scores.sum(axis=-2)
        n_select = self.n_select(scores.shape[-1])
        _, ats_indices = jax.lax.top_k(scores, n_select)
        ats_indices = jnp.sort(ats_indices.astype(jnp.int32), axis=-1)
        ats_indices = jax.lax.cond(
            state["ats_has_last"],
            lambda new: _stabilize_ats_indices(state["ats_last"], new),
            lambda new: new,
            ats_indices,
        )
        state = dict(state)
        state["ats_last"] = ats_indices
        state["ats_has_last"] = jnp.ones((), bool)
        return take_rows(a, ats_indices), ats_indices, state

    @staticmethod
    def _gather_ats_skip(skip_1, ats_indices):
        if ats_indices is None:
            return skip_1
        return take_rows(skip_1, ats_indices)

    # -- matmul-2 casting -----------------------------------------------------

    def _cast_matmul_2(self, x, v):
        if self.matmul_2_cast is None:
            return x, v, None
        dtype = _CAST_DTYPES[self.matmul_2_cast]
        return x.astype(dtype), v.astype(dtype), x.dtype

    def _uncast_matmul_2(self, x, old_dtype):
        if old_dtype is None:
            return x
        return x.astype(old_dtype)


def _pool_matrix(size, pool, dtype):
    """(N/p, N) average-pool matrix: row (py, px) holds 1/(ph*pw) at the
    ph*pw grid positions of its window, 0 elsewhere (see _pool_tokens)."""
    h, w = size
    ph, pw = pool
    n_out = (h // ph) * (w // pw)
    n_in = h * w
    out_idx = jnp.arange(n_out)
    in_idx = jnp.arange(n_in)
    oy, ox = out_idx // (w // pw), out_idx % (w // pw)
    iy, ix = in_idx // w, in_idx % w
    hit = (iy[None, :] // ph == oy[:, None]) & (ix[None, :] // pw == ox[:, None])
    return hit.astype(dtype) / (ph * pw)


def _stabilize_ats_indices(last, new):
    """Vectorized equivalent of the reference's stabilization loop
    (blocks.py:378-391): keep old indices that are still selected; fill the
    vacated slots with the newly-selected indices, in order."""

    def one(old, new_sorted):
        old_sorted = jnp.sort(old)
        old_in_new = _is_member(old, new_sorted)
        new_in_old = _is_member(new_sorted, old_sorted)
        old_not_in_new = ~old_in_new
        new_not_in_old = ~new_in_old
        # Compact the new-not-in-old values to the front, preserving order.
        order = jnp.argsort(jnp.where(new_not_in_old, 0, 1), stable=True)
        fill_values = new_sorted[order]
        rank = jnp.cumsum(old_not_in_new) - 1
        fills = fill_values[jnp.clip(rank, 0, fill_values.shape[0] - 1)]
        return jnp.where(old_not_in_new, fills, old)

    flat_last = last.reshape(-1, last.shape[-1])
    flat_new = new.reshape(-1, new.shape[-1])
    out = jax.vmap(one)(flat_last, flat_new)
    return out.reshape(new.shape)


def _is_member(values, sorted_ref):
    pos = jnp.clip(
        jnp.searchsorted(sorted_ref, values, side="left"), 0, sorted_ref.shape[0] - 1
    )
    return sorted_ref[pos] == values


class EventfulTokenwiseBlock(Block):
    """Gates the token-wise operations: three gate→op→buffer groups around
    qkv, projection and MLP (reference blocks.py:399-463). Attention itself
    runs dense on the full buffer."""

    def __init__(self, gate_before_ln=False, stgt=False, **super_kwargs):
        super().__init__(**super_kwargs)
        self.gate_before_ln = gate_before_ln
        self.stgt = stgt
        gate_class = SimpleSTGTGate if stgt else TokenGate
        self.qkv_gate = gate_class()
        self.qkv_accumulator = TokenBuffer()
        self.projection_gate = gate_class()
        self.projection_accumulator = TokenBuffer()
        self.mlp_gate = gate_class()
        self.mlp_accumulator = TokenBuffer()
        # TPU-first (exact): for TokenGate, every buffer row equals the op
        # applied to the corresponding gate-state row, so the qkv/projection
        # buffers can be RECOMPUTED from p with one dense matmul instead of
        # maintaining buffer state + scatter-blends — trading near-free MXU
        # FLOPs for HBM traffic (docs/PERF_NOTES.md). Reported FLOP counts
        # stay at the reference's k-row semantics via valid_frac. Invalid for
        # STGT (its p is overwritten with the full input each step) and for
        # the MLP (recomputing would restore the full hidden-layer traffic).
        self.recompute_buffers = not stgt
        # Gate-group fusion mode (ops/pallas/):
        #   "auto"  — pick per shape on TPU (v2 single-pass kernels when the
        #             whole (N, C) token block fits VMEM, v1 recompute
        #             kernels at mid N, unfused at large N where the fused
        #             kernels measured neutral-to-worse, docs/PERF_NOTES.md);
        #   "v2"/"v1"/True — force (interpret mode off-TPU, for tests;
        #             True == "v2");
        #   False   — always unfused.
        self.fused_gates = "auto"
        # Gate-pass sharing (round 4): the projection/MLP group kernels
        # emit the NEXT gate's selection norms from their output block in
        # VMEM, saving the norms pass's re-read of that activation from
        # HBM (within-block: proj kernel -> MLP gate; cross-block via
        # ViTBackbone.apply: MLP kernel -> next block's qkv gate). False
        # disables (A/B lever; docs/PERF_NOTES.md round 4).
        self.share_gate_passes = "auto"
        # Window-resident qkv buffer (round 4): for WINDOWED blocks in
        # blocked mode, store the qkv accumulator PERMANENTLY in the
        # window-partitioned layout its only consumer (windowed attention)
        # needs — the per-step pad+transpose relayout of the full (N, 3C)
        # buffer (profiled as layout-conversion copies on the pallas
        # output) becomes a free reshape. The blocked kernel splits into a
        # row-major p-select and a window-major scatter-blend with indices
        # remapped through the static window permutation (identical HBM
        # traffic, one extra launch). Pad rows hold the qkv bias row
        # (reference blocks.py:269-287), written once at flush and never
        # selected after. "auto" = on whenever windowed + blocked mode;
        # False disables.
        self.window_resident_qkv = "auto"

    # Per-shape fusion thresholds (measured on TPU v5e, docs/PERF_NOTES.md):
    #   n <= V2MLP_MAX: "v2mlp" — XLA recompute qkv/proj + v2 MLP kernel.
    #     Full v2's extra buffer state costs more in scan/carry traffic than
    #     its gathered matmuls save at small N (k-row matmuls underutilize
    #     the MXU per grid instance).
    #   n <= V2_MAX:   "v2" — all three groups via the whole-group kernels;
    #     at ViTDet N the k/N FLOP savings dominate and stacks are
    #     heterogeneous (unrolled), so no scan-slice copies.
    #   n >  V2_MAX:   "blocked" — the whole-(N, C)-in-VMEM kernels exceed
    #     VMEM (ViTDet-1024 N=4096); the blocked path keeps selection and
    #     the k-row op in XLA and fuses all full-size state passes
    #     (gate select + buffer scatter-blend + skip-add) in one tiled
    #     kernel (ops/pallas/gate_block.py).
    V2MLP_MAX_TOKENS = 512
    V2_MAX_TOKENS = 2048
    RECOMPUTE_MAX_TOKENS = 2048

    def _fused_mode(self, n_tokens):
        if self.stgt or self.fused_gates is False:
            return False
        if self.fused_gates == "v1":
            return "v1" if self.recompute_buffers else False
        if self.fused_gates == "v4":
            # whole-block resident kernel (ops/pallas/block_fused.py)
            return "v4" if self._v4_eligible() else "v2mlp"
        if self.fused_gates in ("v2", "v2mlp", "v1v2", "v3", "blocked", True):
            return "v2" if self.fused_gates is True else self.fused_gates
        try:
            import jax

            on_tpu = jax.devices()[0].platform not in ("cpu",)
        except Exception:
            on_tpu = False
        if not on_tpu:
            return False
        if self.drop_path.drop_rate != 0.0 or self.ats_fraction is not None:
            return False
        if n_tokens <= self.V2MLP_MAX_TOKENS:
            # whole-block v4 pipeline where structurally eligible: measured
            # 1.0834x vs v2mlp's 1.0670x at the ViViT K400 point (one-process
            # 3-way A/B, docs/PERF_NOTES.md round 5); the per-head weight
            # layout keeps its Mosaic compile at ~4 s (was 313 s)
            return "v4" if self._v4_eligible() else "v2mlp"
        if n_tokens <= self.V2_MAX_TOKENS:
            return "v2"
        return "blocked"

    def _recompute(self, n_tokens):
        """Recompute qkv/projection buffers from gate state (dense matmul,
        zero buffer state) vs maintain buffers and compute k rows. Recompute
        wins while the dense matmul is cheap relative to buffer traffic; at
        large N (ViTDet-1024) the gathered path wins."""
        return self.recompute_buffers and n_tokens <= self.RECOMPUTE_MAX_TOKENS

    def _v4_eligible(self):
        """Whole-block kernel structural eligibility: exactly the v2mlp
        select-only/recompute semantics (TokenGate, recompute buffers, no
        windows/pooling/rel-pos/ATS/SP, post-LN gates, plain attention) plus
        the in-kernel top-k contract (mask-free order-2 TokenNormTopK on all
        three gates — see _use_in_kernel_topk)."""
        from eventful_transformer_tpu.core.policies import TokenNormTopK

        if (
            self.stgt
            or not self.recompute_buffers
            or self.gate_before_ln
            or self._attention_uses_index
            or self.window_size is not None
            or self.pool_size is not None
            or self.relative_position is not None
            or self.ats_fraction is not None
            or self.sequence_parallel is not None
            or self.matmul_2_cast is not None
            or self.drop_path.drop_rate != 0.0
        ):
            return False
        # kernel A slices q/k/v per head from the (N, 3C) qkv block; at
        # large C the offsets must be expressible as 128-aligned pair tiles
        # or per-head slicing is a Mosaic compile catastrophe (313 s
        # measured) — see block_fused.py::_make_qkv_attention_kernel
        head_dim = self.dim // self.heads
        if self.dim > 256 and head_dim % 128 != 0 and (
            self.heads % 2 != 0 or (2 * head_dim) % 128 != 0
        ):
            return False
        return all(
            type(g.policy) is TokenNormTopK
            and not g.policy.save_status
            and g.policy.order == 2
            for g in self.gates
        )

    def _v4_block_step(self, ctx, params, state, x, norms=None, next_gate=None):
        """One whole-block incremental step via the 3-kernel pipeline
        (ops/pallas/block_fused.py): [qkv select + recompute + attention +
        proj norms] -> top_k -> [proj select + recompute + skip + MLP
        norms] -> top_k -> [gated MLP] (the existing gate_group_mlp, which
        also emits the NEXT block's qkv norms when chained). Semantics ==
        the v2mlp dispatch (select-only qkv/proj recompute + gated MLP);
        reference-parity FLOP counts replicated from the unfused path's
        exact adds. ``norms``: this block's qkv-gate norms from the
        previous block's emission. Returns (y, state, next_norms)."""
        import jax

        from eventful_transformer_tpu.core.indexing import coverage_from_norms
        from eventful_transformer_tpu.ops.pallas.block_fused import (
            proj_group,
            qkv_attention_group,
        )
        from eventful_transformer_tpu.ops.pallas.gate_fused import ln_norms
        from eventful_transformer_tpu.ops.pallas.gate_group import gate_group_mlp

        interpret = jax.devices()[0].platform == "cpu"
        n = x.shape[-2]
        kq = self.qkv_gate.policy.capacity(n)
        kp = self.projection_gate.policy.capacity(n)
        km = self.mlp_gate.policy.capacity(n)
        ln1, ln2 = params["input_layer_norm"], params["mlp_layer_norm"]
        if norms is None:
            norms = ln_norms(
                x, state["qkv_gate"]["p"], ln1["scale"], ln1["bias"],
                interpret=interpret,
            )
        cov1 = coverage_from_norms(norms, kq)
        pq, attn, norms2 = qkv_attention_group(
            x, state["qkv_gate"]["p"], cov1, state["projection_gate"]["p"],
            ln1["scale"], ln1["bias"],
            params["qkv"]["kernel"], params["qkv"]["bias"],
            heads=self.heads, inv_scale=1.0 / self.scale, interpret=interpret,
        )
        cov2 = coverage_from_norms(norms2, kp)
        pp, y1, norms3 = proj_group(
            attn, state["projection_gate"]["p"], cov2, x,
            state["mlp_gate"]["p"],
            params["projection"]["kernel"], params["projection"]["bias"],
            ln2["scale"], ln2["bias"], interpret=interpret,
        )
        cov3 = coverage_from_norms(norms3, km)
        p_next, n_scale, n_bias = next_gate or (None, None, None)
        outs = gate_group_mlp(
            y1,
            state["mlp_gate"]["p"],
            state["mlp_accumulator"]["b"],
            cov3,
            ln2["scale"], ln2["bias"],
            params["mlp_1"]["kernel"], params["mlp_1"]["bias"],
            params["mlp_2"]["kernel"], params["mlp_2"]["bias"],
            p_next, n_scale, n_bias,
            ln_mode="post", kcap=km, interpret=interpret,
        )
        pm, bm, y = outs[:3]
        next_norms = outs[3] if next_gate is not None else None
        state = dict(state)
        state["qkv_gate"] = {"p": pq}
        state["projection_gate"] = {"p": pp}
        state["mlp_gate"] = {"p": pm}
        state["mlp_accumulator"] = {"b": bm}
        # Reference-parity counts — the unfused path's exact keys/formulas:
        # select-only gates (gating.py:90-111), valid_frac recompute linears
        # (nn.py:147-154), counted attention matmuls, counted adds.
        b, _, c = x.shape
        rows = float(b * n)
        hd = c // self.heads
        ctx.add("gate_flops", x.size)  # qkv gate
        fq = kq / n
        ctx.add("linear_flops", fq * float(x.size * self.qkv.out_features))
        ctx.add("bias_flops", fq * rows * self.qkv.out_features)
        ctx.add("matmul_flops", float(b * self.heads * n * n * hd))  # q·kT
        ctx.add("matmul_flops", float(b * self.heads * n * hd * n))  # A·V
        ctx.add("gate_flops", x.size)  # projection gate
        fp = kp / n
        ctx.add("linear_flops", fp * float(x.size * self.projection.out_features))
        ctx.add("bias_flops", fp * rows * self.projection.out_features)
        ctx.add("add_flops", x.size)  # skip_1 residual
        ctx.add("gate_flops", x.size)  # mlp gate
        fm = km / n
        hidden = self.mlp_1.out_features
        ctx.add("linear_flops", fm * float(x.size * hidden))
        ctx.add("bias_flops", fm * rows * hidden)
        ctx.add("linear_flops", fm * rows * hidden * self.mlp_2.out_features)
        ctx.add("bias_flops", fm * rows * self.mlp_2.out_features)
        ctx.add("add_flops", y.size)  # mlp residual
        return y, state, next_norms

    def _resident_qkv(self, n_tokens):
        """Whether the qkv buffer lives in window-major layout (see
        ``window_resident_qkv``). Static per config — state shapes depend
        on it. Applies in both fused regimes that maintain a qkv buffer
        (v2 whole-group and blocked); the resident qkv group always runs
        the blocked select/scatter pair (tiled kernels work at any N)."""
        return (
            self.window_resident_qkv is not False
            and self.window_size is not None
            and self.pool_size is None
            and self.ats_fraction is None
            and self._fused_mode(n_tokens) in ("v2", "blocked")
        )

    def _resident_rows(self):
        """Window-major row count: padded spatial extent (pad rows hold the
        qkv bias row and persist across steps)."""
        p = self._compute_window_padding()
        return (self.input_size[0] + p[0]) * (self.input_size[1] + p[1])

    def _window_inv_ext(self):
        """(N + 1,) static host table: row-major token -> window-major
        position, with the out-of-range selection marker N -> -1 (never
        matches any kernel row)."""
        cached = getattr(self, "_window_inv_ext_cache", None)
        if cached is None:
            import numpy as _np

            _, inv = self._window_perm()
            cached = _np.concatenate(
                [inv.astype(_np.int32), _np.full((1,), -1, _np.int32)]
            )
            self._window_inv_ext_cache = cached
        return cached

    def _partition_windows_resident(self, params, x):
        """Flush-time partition into the RESIDENT window-major layout
        (B, NW, 3C): pad rows = the qkv bias row (= qkv(0), reference
        blocks.py:269-287), UNcounted — the resident attention entry
        (`_forward_attention(pre_partitioned=True)`) adds the counted
        pad-bias term exactly once per forward, like the relayout paths."""
        p = self._compute_window_padding()
        d = self.window_size
        b, _, c = x.shape
        h, w = self.input_size
        x = x.reshape(b, h, w, c)
        if any(p):
            pad_vec = params["qkv"]["bias"].astype(x.dtype)
            padded = jnp.broadcast_to(pad_vec, (b, h + p[0], w + p[1], c))
            x = padded.at[:, :h, :w].set(x)
            h, w = h + p[0], w + p[1]
        x = x.reshape(b, h // d[0], d[0], w // d[1], d[1], c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, h * w, c)

    @property
    def gates(self):
        return [self.qkv_gate, self.projection_gate, self.mlp_gate]

    def init_state(self, batch, n_tokens, dtype=jnp.float32):
        state = super().init_state(batch, n_tokens, dtype)
        n_out = self.out_tokens(n_tokens)
        state.update(
            first=jnp.ones((), bool),
            qkv_gate=self.qkv_gate.init_state((batch, n_tokens, self.dim), dtype),
            projection_gate=self.projection_gate.init_state((batch, n_out, self.dim), dtype),
            mlp_gate=self.mlp_gate.init_state((batch, n_out, self.dim), dtype),
            mlp_accumulator=self.mlp_accumulator.init_state((batch, n_out, self.dim), dtype),
        )
        # qkv / projection buffers exist as state when gathered (unfused
        # non-recompute, or v2/blocked fused which compute on k rows and
        # blend); the v1 recompute path derives them from p instead.
        if not self._recompute(n_tokens) or self._fused_mode(n_tokens) in (
            "v2", "blocked",
        ):
            qkv_rows = (
                self._resident_rows() if self._resident_qkv(n_tokens)
                else n_tokens
            )
            state["qkv_accumulator"] = self.qkv_accumulator.init_state(
                (batch, qkv_rows, 3 * self.dim), dtype
            )
            state["projection_accumulator"] = self.projection_accumulator.init_state(
                (batch, n_out, self.dim), dtype
            )
        return state

    def apply(self, ctx: Ctx, params, state, x, aux=None, mode=None,
              qkv_norms=None, next_gate=None):
        """``mode``: None dispatches on ``state['first']`` via ``lax.cond``;
        "flush" / "incremental" select the branch STATICALLY.
        ``qkv_norms`` / ``next_gate``: cross-block gate-pass sharing
        (incremental mode only; see ViTBackbone.apply) — with ``next_gate``
        the return gains a third element (the next block's qkv norms). Callers whose
        frame index determines flush-ness (every per-video scan: frame 0
        flushes, the rest are incremental) should split flush-then-scan —
        a cond inside the hot loop makes XLA materialize layout copies of
        the multi-MB state buffers every block-step (profiled: ~30% of the
        ViTDet-672 eventful backbone was `copy`/`reshape` ops from this)."""
        if mode == "flush":
            return self._apply_flush(ctx, params, state, x, aux)
        if mode == "incremental":
            return self._apply_incremental(
                ctx, params, state, x, aux, qkv_norms=qkv_norms,
                next_gate=next_gate,
            )
        return counting.cond(
            state["first"], self._apply_flush, self._apply_incremental,
            (params, state, x, aux), ctx,
        )

    # -- flush path: dense compute, buffers initialized ----------------------

    def _apply_flush(self, ctx, params, state, x, aux):
        state = dict(state)
        state["first"] = jnp.zeros((), bool)
        skip_1 = x
        if self.gate_before_ln:
            _, state["qkv_gate"] = self.qkv_gate.flush(state["qkv_gate"], x)
            x = layer_norm(x, params["input_layer_norm"], LN_EPS)
        else:
            x = layer_norm(x, params["input_layer_norm"], LN_EPS)
            _, state["qkv_gate"] = self.qkv_gate.flush(state["qkv_gate"], x)
        x = self.qkv.apply(ctx, params["qkv"], x)
        resident = (
            "qkv_accumulator" in state and self._resident_qkv(x.shape[-2])
        )
        if resident:
            x = self._partition_windows_resident(params, x)
            # flush through the buffer abstraction so TokenBuffer stays the
            # single owner of its state layout (returns (x, {"b": x}))
            x, state["qkv_accumulator"] = self.qkv_accumulator.flush(
                state["qkv_accumulator"], x
            )
            x, ats_indices, state = self._forward_attention(
                ctx, params, state, x, aux, pre_partitioned=True
            )
        else:
            if "qkv_accumulator" in state:
                x, state["qkv_accumulator"] = self.qkv_accumulator.flush(
                    state["qkv_accumulator"], x
                )
            x, ats_indices, state = self._attention_flush(
                ctx, params, state, x, aux
            )
        skip_1 = self._gather_ats_skip(skip_1, ats_indices)
        x, _ = self._post_attention(ctx, params, state, x, skip_1, flush=True)
        return x, state

    # Whether _attention_incremental consumes the qkv gate's selection
    # indices (the eventful-attention subclasses do; index-free gates can
    # then take the cheaper norms->coverage selection path).
    _attention_uses_index = False

    def _attention_flush(self, ctx, params, state, x, aux):
        return self._forward_attention(ctx, params, state, x, aux)

    # -- incremental path ------------------------------------------------------

    def _apply_incremental(self, ctx, params, state, x, aux, qkv_norms=None,
                           next_gate=None):
        state = dict(state)
        skip_1 = x
        # Pallas kernels have no VJP here; training runs the XLA paths.
        mode = False if ctx.training else self._fused_mode(x.shape[-2])
        if mode == "v4":
            # Whole-block kernel pipeline (ops/pallas/block_fused.py):
            # three fused kernels split at the top-k boundaries; cross-
            # block norms emission chains v4 blocks (only the first block
            # of a stack pays an XLA norms pass).
            if self.gate_before_ln:
                qkv_norms = None
            out, state, next_norms = self._v4_block_step(
                ctx, params, state, x, norms=qkv_norms, next_gate=next_gate
            )
            return (out, state, next_norms) if next_gate is not None else (out, state)
        resident = self._resident_qkv(x.shape[-2])
        # Training (or a forced-unfused override) runs the differentiable
        # XLA path while the resident state layout stays window-major (it
        # is static and cannot switch at trace time). Bridge with two
        # static permutations per block-step: de-permute the buffer to
        # row-major here, run the plain path, re-partition after the
        # update. Negligible cost at training scale; inference always
        # dispatches v2/blocked when resident, so this never runs hot.
        train_resident = resident and mode not in ("v2", "blocked")
        if train_resident:
            _, inv = self._window_perm()
            b = state["qkv_accumulator"]["b"]
            state["qkv_accumulator"] = {
                "b": jnp.take(b, jnp.asarray(inv), axis=1)
            }
            resident = False
        # Precomputed qkv-gate norms (cross-block pass sharing) are only
        # valid in the post-LN gate domain.
        if self.gate_before_ln:
            qkv_norms = None
        if mode == "v2" and not resident:
            ln_mode = "pre" if self.gate_before_ln else "post"
            (p_new, b_new), index, mask = self._v2_group_linear(
                ctx,
                self.qkv_gate,
                state["qkv_gate"],
                state["qkv_accumulator"],
                x,
                params["input_layer_norm"],
                ln_mode,
                self.qkv,
                params["qkv"],
                need_index=self._attention_uses_index,
                norms=qkv_norms,
            )
            state["qkv_gate"] = {"p": p_new}
            state["qkv_accumulator"] = {"b": b_new}
            x = b_new
        elif mode == "blocked" or (mode == "v2" and resident):
            group = (
                self._blocked_group_linear_resident
                if resident
                else self._blocked_group_linear
            )
            (p_new, b_new), index, mask = group(
                ctx,
                self.qkv_gate,
                state["qkv_gate"],
                state["qkv_accumulator"],
                x,
                params["input_layer_norm"],
                "pre" if self.gate_before_ln else "post",
                self.qkv,
                params["qkv"],
                norms=qkv_norms,
            )
            state["qkv_gate"] = {"p": p_new}
            state["qkv_accumulator"] = {"b": b_new}
            x = b_new
        elif mode in ("v1", "v1v2", "v3"):
            x, index, mask, state["qkv_gate"] = self._fused_gate_group(
                ctx,
                state["qkv_gate"],
                x,
                self.qkv_gate.policy,
                params["input_layer_norm"],
                self.qkv,
                params["qkv"],
                ln_mode="pre" if self.gate_before_ln else "post",
            )
        elif (
            "qkv_accumulator" not in state
            and not self._attention_uses_index
            and self.qkv_gate.select_only_ok()
        ):
            # buffer == qkv(p) exactly (p holds each token's value at its
            # last update); recompute densely instead of scatter-blending.
            # The gathered rows and indices are never consumed, so the gate
            # runs select-only (norms -> coverage, no row gather/one-hot).
            ln = params["input_layer_norm"]
            c = x if self.gate_before_ln else layer_norm(x, ln, LN_EPS)
            kcap, state["qkv_gate"] = self.qkv_gate.incremental_select(
                ctx, state["qkv_gate"], c, norms=qkv_norms
            )
            index, mask = None, None
            p = state["qkv_gate"]["p"]
            if self.gate_before_ln:
                p = layer_norm(p, ln, LN_EPS)
            x = self.qkv.apply(ctx, params["qkv"], p, valid_frac=kcap / p.shape[-2])
        else:
            x_t, index, mask, state["qkv_gate"] = self._gate_ln(
                ctx, params["input_layer_norm"], self.qkv_gate, state["qkv_gate"], x
            )
            if "qkv_accumulator" not in state:
                # buffer == qkv(p) exactly; recompute densely (gathered rows
                # unused, but the caller consumes the indices).
                p = state["qkv_gate"]["p"]
                if self.gate_before_ln:
                    p = layer_norm(p, params["input_layer_norm"], LN_EPS)
                frac = (index.shape[-1] / p.shape[-2]) * valid_fraction(mask)
                x = self.qkv.apply(ctx, params["qkv"], p, valid_frac=frac)
            else:
                x_t = self.qkv.apply(
                    ctx, params["qkv"], x_t, valid_frac=valid_fraction(mask)
                )
                x, state["qkv_accumulator"] = self.qkv_accumulator.incremental(
                    state["qkv_accumulator"], x_t, index, mask
                )
        if train_resident:
            # restore the persistent window-major layout (pad rows = qkv
            # bias row, same as flush) for the next incremental step
            state["qkv_accumulator"] = {
                "b": self._partition_windows_resident(params, x)
            }
        if resident:
            x, ats_indices, state = self._forward_attention(
                ctx, params, state, x, aux, pre_partitioned=True
            )
        else:
            x, ats_indices, state = self._attention_incremental(
                ctx, params, state, x, index, mask, aux
            )
        skip_1 = self._gather_ats_skip(skip_1, ats_indices)
        x, next_norms = self._post_attention(
            ctx, params, state, x, skip_1, flush=False, next_gate=next_gate
        )
        if next_gate is not None:
            return x, state, next_norms
        return x, state

    def _attention_incremental(self, ctx, params, state, x, index, mask, aux):
        return self._forward_attention(ctx, params, state, x, aux)

    def _fused_gate_group(
        self, ctx, gate_state, x, policy, ln_params, linear, linear_params, ln_mode
    ):
        """Gate + state-select + op recompute via the fused Pallas kernels
        (ops/pallas/gate_fused.py). Exact semantics of the unfused path;
        reference-parity FLOP counts added manually."""
        import jax

        from eventful_transformer_tpu.core.indexing import coverage
        from eventful_transformer_tpu.ops.pallas.gate_fused import (
            ln_norms,
            ln_select_matmul,
        )

        interpret = jax.devices()[0].platform == "cpu"
        p = gate_state["p"]
        ctx.add("gate_flops", x.size)
        if ln_mode == "post":
            norms = ln_norms(
                x, p, ln_params["scale"], ln_params["bias"], interpret=interpret
            )
        else:  # "pre" or "none": error in the input domain
            norms = jnp.linalg.norm((x - p).astype(jnp.float32), axis=-1)
        index, mask = policy.select_from_norms(norms, ctx)
        cov = coverage(index, mask, x.shape[-2], index.ndim + 1)
        if ln_mode == "none":
            scale = jnp.ones((x.shape[-1],), jnp.float32)
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        else:
            scale, bias = ln_params["scale"], ln_params["bias"]
        p_new, y = ln_select_matmul(
            x,
            p,
            cov,
            scale,
            bias,
            linear_params["kernel"],
            linear_params["bias"],
            ln_mode=ln_mode,
            interpret=interpret,
        )
        frac = (index.shape[-1] / x.shape[-2]) * valid_fraction(mask)
        ctx.add("linear_flops", frac * float(x.size * linear.out_features))
        ctx.add("bias_flops", frac * float(y.size))
        return y, index, mask, {"p": p_new}

    def _fused_gate_select(self, ctx, gate_state, x, policy, ln_params):
        """Fused gate for gathered (non-recompute) groups — the MLP: fused
        norms + fused state-select; the gathered op input rows are read back
        from p' itself (selected rows of p' ARE ln(x) rows — no full-size
        LN materialization)."""
        import jax

        from eventful_transformer_tpu.core.indexing import coverage
        from eventful_transformer_tpu.ops.pallas.gate_fused import ln_norms, ln_select

        interpret = jax.devices()[0].platform == "cpu"
        p = gate_state["p"]
        ctx.add("gate_flops", x.size)
        if self.gate_before_ln:
            norms = jnp.linalg.norm((x - p).astype(jnp.float32), axis=-1)
        else:
            norms = ln_norms(
                x, p, ln_params["scale"], ln_params["bias"], interpret=interpret
            )
        index, mask = policy.select_from_norms(norms, ctx)
        cov = coverage(index, mask, x.shape[-2], index.ndim + 1)
        p_new = ln_select(
            x, p, cov, ln_params["scale"], ln_params["bias"],
            apply_ln=not self.gate_before_ln, interpret=interpret,
        )
        rows = take_rows(p_new, index)
        if self.gate_before_ln:
            rows = layer_norm(rows, ln_params, LN_EPS)
        return rows, index, mask, {"p": p_new}

    # -- v2 whole-group fused kernels (ops/pallas/gate_group.py) ---------------

    # In-kernel top-k (gate_group kernels with cov=None): the selection — an
    # (N, N) rank-comparison + ones-matmul — runs INSIDE the group kernel,
    # eliminating the separate norms pass and the XLA top_k round trip.
    # Default OFF after measurement (docs/PERF_NOTES.md): at ViViT N=197 the
    # in-kernel selection HALVED eventful throughput (the rank compare runs
    # serially per grid instance while batched lax.top_k costs only ~20 us),
    # and at ViTDet N=1764 the (N, N) comparison hung the remote Mosaic
    # compile. The radix-bisection reformulation (round 4) fixed the
    # large-N hang in interpret mode but is a compile catastrophe on the
    # real Mosaic toolchain: ONE selection at N=24/B=2 took 181 s to
    # compile (round 5) — which is why the whole-block v4 path splits its
    # kernels at the top-k boundaries instead of selecting in-kernel.
    # Kept as a tested option (True forces; golden -topk tests).
    in_kernel_topk = False
    TOPK_MAX_TOKENS = 512

    def _use_in_kernel_topk(self, pol, n_tokens):
        from eventful_transformer_tpu.core.policies import TokenNormTopK

        if self.in_kernel_topk is False:
            return False
        eligible = (
            type(pol) is TokenNormTopK and not pol.save_status and pol.order == 2
        )
        if self.in_kernel_topk is True:
            return eligible
        try:
            import jax

            on_tpu = jax.devices()[0].platform not in ("cpu",)
        except Exception:
            on_tpu = False
        return eligible and on_tpu and n_tokens <= self.TOPK_MAX_TOKENS

    def _v2_select(self, ctx, gate, gate_state, x, ln_params, ln_mode, norms=None,
                   need_index=False, allow_topk=True):
        """Shared v2 front half: error norms -> policy -> coverage.
        ``norms``: precomputed by an upstream fused kernel (v3).
        ``need_index``: the caller consumes the selection indices themselves
        (the eventful-attention blocks); otherwise mask-free top-k policies
        take the cheaper norms->coverage path (no index gather, no one-hot).
        Returns (kcap, index, mask, cov, interpret); index is None on the
        coverage-only path; cov is None when the group kernel should select
        in-kernel (see in_kernel_topk)."""
        import jax

        from eventful_transformer_tpu.core.indexing import coverage, coverage_from_norms
        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.ops.pallas.gate_fused import ln_norms

        interpret = jax.devices()[0].platform == "cpu"
        p = gate_state["p"]
        pol0 = gate.policy
        if (
            allow_topk
            and norms is None
            and not need_index
            and self._use_in_kernel_topk(pol0, x.shape[-2])
        ):
            ctx.add("gate_flops", x.size)
            return pol0.capacity(x.shape[-2]), None, None, None, interpret
        ctx.add("gate_flops", x.size)
        if norms is not None:
            pass
        elif ln_mode == "post":
            norms = ln_norms(
                x, p, ln_params["scale"], ln_params["bias"], interpret=interpret
            )
        else:  # "pre" / "none": error in the input domain
            norms = jnp.linalg.norm((x - p).astype(jnp.float32), axis=-1)
        pol = gate.policy
        if (
            not need_index
            and isinstance(pol, TokenNormTopK)
            and not pol.save_status
        ):
            kcap = pol.capacity(x.shape[-2])
            cov = coverage_from_norms(norms, kcap)
            return kcap, None, None, cov, interpret
        index, mask = pol.select_from_norms(norms, ctx)
        cov = coverage(index, mask, x.shape[-2], index.ndim + 1)
        return index.shape[-1], index, mask, cov, interpret

    # -- blocked large-N fused kernels (ops/pallas/gate_block.py) -------------

    def _blocked_select(self, ctx, gate, gate_state, x, ln_params, ln_mode,
                        norms=None):
        """Selection front half for the blocked large-N path: error norms ->
        policy -> index list (top-k order), coverage. Selection order is
        semantically free: every consumer is positional (the kernel builds
        its scatter one-hot from the index list directly; deduped pooled
        indices and forced col gates are order-insensitive). Invalid slots
        hold N (out of range — never matched, never scattered). ``norms``:
        precomputed by an upstream kernel (pass sharing) — skips the norms
        pass. Returns (s_index, s_mask, cov, interpret)."""
        import jax

        from eventful_transformer_tpu.core.indexing import coverage
        from eventful_transformer_tpu.ops.pallas.gate_fused import ln_norms

        interpret = jax.devices()[0].platform == "cpu"
        p = gate_state["p"]
        ctx.add("gate_flops", x.size)
        if norms is not None:
            pass
        elif ln_mode == "post":
            norms = ln_norms(
                x, p, ln_params["scale"], ln_params["bias"], interpret=interpret
            )
        else:  # "pre" / "none": error in the input domain
            norms = jnp.linalg.norm((x - p).astype(jnp.float32), axis=-1)
        n = x.shape[-2]
        from eventful_transformer_tpu.core.policies import TokenNormTopK

        pol = gate.policy
        if type(pol) is TokenNormTopK and not pol.save_status:
            # Mask-free fixed-k: coverage comes from a compare against the
            # k-th value of the SAME top_k call (exact tie handling,
            # coverage_from_kth) — no (B, k, N) one-hot materialization,
            # no index sort (the kernel one-hot matches positions against
            # the raw top-k index list).
            k = pol.capacity(n)
            values, index = jax.lax.top_k(norms, k)
            from eventful_transformer_tpu.core.indexing import coverage_from_kth

            s_index = index.astype(jnp.int32)
            s_mask = None
            cov = coverage_from_kth(norms, values[..., k - 1 : k], k)
        else:
            index, mask = pol.select_from_norms(norms, ctx)
            if mask is None:
                s_index = index.astype(jnp.int32)
                s_mask = None
            else:
                # invalid slots keyed out-of-range: the kernel one-hot
                # never matches them and their gathered rows are never
                # scattered (cov excludes them)
                s_index = jnp.where(mask, index, n).astype(jnp.int32)
                s_mask = mask
            cov = coverage(index, mask, n, index.ndim + 1)  # (B, N)
        return s_index, s_mask, cov, interpret

    def _blocked_group_linear(
        self, ctx, gate, gate_state, buf_state, x, ln_params, ln_mode, linear,
        linear_params, skip=None, norms=None, next_gate=None,
    ):
        """Blocked gate -> k-row linear -> buffer blend (-> skip-add): the
        op runs in XLA on the compacted rows; one tiled kernel does every
        full-size state pass. ``norms``: precomputed selection norms (pass
        sharing); ``next_gate`` (p_next, scale, bias): emit the next gate's
        norms from the y block (requires ``skip``). Returns
        (kernel outputs, s_index, s_mask)."""
        from eventful_transformer_tpu.ops.pallas.gate_block import (
            block_select_scatter,
        )

        s_index, s_mask, cov, interpret = self._blocked_select(
            ctx, gate, gate_state, x, ln_params, ln_mode, norms=norms
        )
        c = take_rows(x, s_index)
        if ln_mode != "none":
            # LN commutes with the row gather (row-local), so gathering the
            # raw rows then normalizing k rows equals normalizing N rows
            # then gathering — at k/N of the cost.
            c = layer_norm(c, ln_params, LN_EPS)
        h = linear.apply(ctx, linear_params, c, valid_frac=valid_fraction(s_mask))
        if ln_mode == "none":
            scale = jnp.ones((x.shape[-1],), jnp.float32)
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        else:
            scale, bias = ln_params["scale"], ln_params["bias"]
        p_next, n_scale, n_bias = next_gate or (None, None, None)
        outs = block_select_scatter(
            x, gate_state["p"], buf_state["b"], cov, s_index, h, scale, bias,
            skip, p_next, n_scale, n_bias,
            apply_ln=(ln_mode == "post"), interpret=interpret,
        )
        return outs, s_index, s_mask

    def _blocked_group_linear_resident(
        self, ctx, gate, gate_state, buf_state, x, ln_params, ln_mode, linear,
        linear_params, norms=None,
    ):
        """Blocked qkv group with the WINDOW-RESIDENT buffer (see
        ``window_resident_qkv``): selection + gate-state select run
        row-major; the buffer scatter-blend runs over the window-major
        buffer with the indices remapped through the static window
        permutation. Same semantics and HBM traffic as
        ``_blocked_group_linear``, minus the downstream relayout."""
        from eventful_transformer_tpu.ops.pallas.gate_block import (
            block_scatter_rows,
            block_select_p,
        )

        s_index, s_mask, cov, interpret = self._blocked_select(
            ctx, gate, gate_state, x, ln_params, ln_mode, norms=norms
        )
        c = take_rows(x, s_index)
        if ln_mode != "none":
            c = layer_norm(c, ln_params, LN_EPS)
        h = linear.apply(ctx, linear_params, c, valid_frac=valid_fraction(s_mask))
        if ln_mode == "none":
            scale = jnp.ones((x.shape[-1],), jnp.float32)
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        else:
            scale, bias = ln_params["scale"], ln_params["bias"]
        p_new = block_select_p(
            x, gate_state["p"], cov, scale, bias,
            apply_ln=(ln_mode == "post"), interpret=interpret,
        )
        w_index = jnp.take(jnp.asarray(self._window_inv_ext()), s_index, axis=0)
        b_new = block_scatter_rows(
            buf_state["b"], w_index, h, interpret=interpret
        )
        return (p_new, b_new), s_index, s_mask

    def _blocked_group_mlp(self, ctx, params, state, x, norms=None,
                           next_gate=None):
        """Blocked gate -> k-row MLP -> buffer blend -> residual. ``norms``:
        precomputed selection norms; ``next_gate``: emit the next block's
        qkv-gate norms from the y block (pass sharing). Returns
        (y, state, next_norms)."""
        from eventful_transformer_tpu.ops.pallas.gate_block import (
            block_select_scatter,
        )

        ln_params = params["mlp_layer_norm"]
        ln_mode = "pre" if self.gate_before_ln else "post"
        s_index, s_mask, cov, interpret = self._blocked_select(
            ctx, self.mlp_gate, state["mlp_gate"], x, ln_params, ln_mode,
            norms=norms,
        )
        c = layer_norm(take_rows(x, s_index), ln_params, LN_EPS)
        h = self._forward_mlp(ctx, params, c, valid_frac=valid_fraction(s_mask))
        p_next, n_scale, n_bias = next_gate or (None, None, None)
        outs = block_select_scatter(
            x, state["mlp_gate"]["p"], state["mlp_accumulator"]["b"], cov,
            s_index, h, ln_params["scale"], ln_params["bias"], None,
            p_next, n_scale, n_bias,
            apply_ln=(ln_mode == "post"), residual_x=True, interpret=interpret,
        )
        p_new, b_new, y = outs[:3]
        next_norms = outs[3] if next_gate is not None else None
        state["mlp_gate"] = {"p": p_new}
        state["mlp_accumulator"] = {"b": b_new}
        ctx.add("add_flops", y.size)
        return y, state, next_norms

    def _v2_group_linear(
        self, ctx, gate, gate_state, buf_state, x, ln_params, ln_mode, linear,
        linear_params, skip=None, need_index=False, norms=None, next_gate=None,
    ):
        """Fused gate -> gathered linear -> buffer blend (-> skip-add).
        ``norms``: precomputed selection norms (pass sharing); ``next_gate``
        (p_next, scale, bias): emit the next gate's norms from the y block
        (requires ``skip``). Returns (kernel outputs, index, mask);
        reference-parity counts."""
        from eventful_transformer_tpu.ops.pallas.gate_group import gate_group_linear

        kcap, index, mask, cov, interpret = self._v2_select(
            ctx, gate, gate_state, x, ln_params, ln_mode, norms=norms,
            need_index=need_index,
        )
        if ln_mode == "none":
            scale = jnp.ones((x.shape[-1],), jnp.float32)
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        else:
            scale, bias = ln_params["scale"], ln_params["bias"]
        p_next, n_scale, n_bias = next_gate or (None, None, None)
        outs = gate_group_linear(
            x,
            gate_state["p"],
            buf_state["b"],
            cov,
            scale,
            bias,
            linear_params["kernel"],
            linear_params["bias"],
            skip,
            p_next,
            n_scale,
            n_bias,
            ln_mode=ln_mode,
            kcap=kcap,
            interpret=interpret,
        )
        frac = (kcap / x.shape[-2]) * valid_fraction(mask)
        rows = x.size // x.shape[-1]
        ctx.add("linear_flops", frac * float(x.size * linear.out_features))
        ctx.add("bias_flops", frac * float(rows * linear.out_features))
        return outs, index, mask

    def _v2_group_mlp(self, ctx, params, state, x, norms=None, next_gate=None):
        """Fused gate -> gathered 2-layer MLP -> buffer blend -> residual.
        The hidden activation never leaves VMEM. ``next_gate``: emit the
        next block's qkv-gate norms from the y block (pass sharing).
        Returns (y, state, next_norms)."""
        from eventful_transformer_tpu.ops.pallas.gate_group import gate_group_mlp

        ln_params = params["mlp_layer_norm"]
        ln_mode = "pre" if self.gate_before_ln else "post"
        kcap, index, mask, cov, interpret = self._v2_select(
            ctx, self.mlp_gate, state["mlp_gate"], x, ln_params, ln_mode, norms=norms
        )
        p_next, n_scale, n_bias = next_gate or (None, None, None)
        outs = gate_group_mlp(
            x,
            state["mlp_gate"]["p"],
            state["mlp_accumulator"]["b"],
            cov,
            ln_params["scale"],
            ln_params["bias"],
            params["mlp_1"]["kernel"],
            params["mlp_1"]["bias"],
            params["mlp_2"]["kernel"],
            params["mlp_2"]["bias"],
            p_next,
            n_scale,
            n_bias,
            ln_mode=ln_mode,
            kcap=kcap,
            interpret=interpret,
        )
        p_new, b_new, y = outs[:3]
        next_norms = outs[3] if next_gate is not None else None
        state["mlp_gate"] = {"p": p_new}
        state["mlp_accumulator"] = {"b": b_new}
        frac = (kcap / x.shape[-2]) * valid_fraction(mask)
        rows = x.size // x.shape[-1]
        hidden = self.mlp_1.out_features
        ctx.add("linear_flops", frac * float(x.size * hidden))
        ctx.add("bias_flops", frac * float(rows * hidden))
        ctx.add("linear_flops", frac * float(rows * hidden * self.mlp_2.out_features))
        ctx.add("bias_flops", frac * float(rows * self.mlp_2.out_features))
        ctx.add("add_flops", y.size)
        return y, state, next_norms

    def _gate_ln(self, ctx, ln_params, gate, gate_state, x):
        """Gate placement around layer norm (reference blocks.py:440-461)."""
        if self.gate_before_ln:
            x_t, index, mask, gate_state = gate.incremental(ctx, gate_state, x)
            x_t = layer_norm(x_t, ln_params, LN_EPS)
        else:
            x = layer_norm(x, ln_params, LN_EPS)
            x_t, index, mask, gate_state = gate.incremental(ctx, gate_state, x)
        return x_t, index, mask, gate_state

    def _post_attention(self, ctx, params, state, x, skip_1, flush,
                        next_gate=None):
        """Projection and MLP gate→op→buffer groups
        (reference blocks.py:430-450). ``next_gate``: the next block's
        (p_qkv, ln_scale, ln_bias) for cross-block norms emission from the
        MLP kernel. Returns (x, next_norms)."""
        mode = False if (flush or ctx.training) else self._fused_mode(x.shape[-2])
        # Within-block pass sharing: the projection group's kernel emits the
        # MLP gate's selection norms from the y block in VMEM (saves the
        # MLP norms pass re-reading y from HBM).
        own_mlp = None
        if (
            mode in ("v2", "blocked")
            and self.share_gate_passes is not False
            and not self.gate_before_ln
            and "mlp_gate" in state
        ):
            own_mlp = (
                state["mlp_gate"]["p"],
                params["mlp_layer_norm"]["scale"],
                params["mlp_layer_norm"]["bias"],
            )
        if mode == "v2":
            # Whole-group fused kernel: folds the skip-add in; the counted
            # add below is replicated manually.
            outs, _, _ = self._v2_group_linear(
                ctx,
                self.projection_gate,
                state["projection_gate"],
                state["projection_accumulator"],
                x,
                None,
                "none",
                self.projection,
                params["projection"],
                skip=skip_1,
                next_gate=own_mlp,
            )
            p_new, b_new, x = outs[:3]
            mlp_norms = outs[3] if own_mlp is not None else None
            state["projection_gate"] = {"p": p_new}
            state["projection_accumulator"] = {"b": b_new}
            ctx.add("add_flops", x.size)
            return self._post_projection(
                ctx, params, state, x, mode, flush, mlp_norms=mlp_norms,
                next_gate=next_gate,
            )
        if mode == "blocked":
            outs, _, _ = self._blocked_group_linear(
                ctx,
                self.projection_gate,
                state["projection_gate"],
                state["projection_accumulator"],
                x,
                None,
                "none",
                self.projection,
                params["projection"],
                skip=skip_1,
                next_gate=own_mlp,
            )
            p_new, b_new, x = outs[:3]
            mlp_norms = outs[3] if own_mlp is not None else None
            state["projection_gate"] = {"p": p_new}
            state["projection_accumulator"] = {"b": b_new}
            ctx.add("add_flops", x.size)
            return self._post_projection(
                ctx, params, state, x, mode, flush, mlp_norms=mlp_norms,
                next_gate=next_gate,
            )
        if mode == "v3":
            # Whole projection group + skip-add + the MLP gate's norms in ONE
            # kernel (ops/pallas/gate_fused.py::select_linear_skip_norms) —
            # the chain [select -> proj -> +skip -> next-gate norms] has no
            # top_k boundary inside it, so it fuses into a single HBM pass.
            from eventful_transformer_tpu.ops.pallas.gate_fused import (
                select_linear_skip_norms,
            )

            gate_state = state["projection_gate"]
            kcap, index, mask, cov, interpret = self._v2_select(
                ctx, self.projection_gate, gate_state, x, None, "none",
                allow_topk=False,
            )
            ln2 = params["mlp_layer_norm"]
            p_new, x, mlp_norms = select_linear_skip_norms(
                x,
                gate_state["p"],
                cov,
                params["projection"]["kernel"],
                params["projection"]["bias"],
                skip_1,
                state["mlp_gate"]["p"],
                ln2["scale"],
                ln2["bias"],
                next_ln=not self.gate_before_ln,
                interpret=interpret,
            )
            state["projection_gate"] = {"p": p_new}
            frac = (kcap / x.shape[-2]) * valid_fraction(mask)
            rows = x.size // x.shape[-1]
            ctx.add("linear_flops", frac * float(x.size * self.projection.out_features))
            ctx.add("bias_flops", frac * float(rows * self.projection.out_features))
            ctx.add("add_flops", x.size)
            return self._post_projection(
                ctx, params, state, x, mode, flush, mlp_norms=mlp_norms,
                next_gate=next_gate,
            )
        if flush:
            _, state["projection_gate"] = self.projection_gate.flush(
                state["projection_gate"], x
            )
            x = self.projection.apply(ctx, params["projection"], x)
            if "projection_accumulator" in state:
                x, state["projection_accumulator"] = self.projection_accumulator.flush(
                    state["projection_accumulator"], x
                )
        elif mode in ("v1", "v1v2"):
            x, index, mask, state["projection_gate"] = self._fused_gate_group(
                ctx,
                state["projection_gate"],
                x,
                self.projection_gate.policy,
                None,
                self.projection,
                params["projection"],
                ln_mode="none",
            )
        elif (
            "projection_accumulator" not in state
            and self.projection_gate.select_only_ok()
        ):
            # Recompute from gate state; gathered rows / indices unused, so
            # the gate runs select-only (see the qkv group above).
            kcap, state["projection_gate"] = self.projection_gate.incremental_select(
                ctx, state["projection_gate"], x
            )
            p = state["projection_gate"]["p"]
            x = self.projection.apply(
                ctx, params["projection"], p, valid_frac=kcap / p.shape[-2]
            )
        else:
            x_t, index, mask, state["projection_gate"] = self.projection_gate.incremental(
                ctx, state["projection_gate"], x
            )
            if "projection_accumulator" not in state:
                p = state["projection_gate"]["p"]
                frac = (index.shape[-1] / p.shape[-2]) * valid_fraction(mask)
                x = self.projection.apply(ctx, params["projection"], p, valid_frac=frac)
            else:
                x_t = self.projection.apply(
                    ctx, params["projection"], x_t, valid_frac=valid_fraction(mask)
                )
                x, state["projection_accumulator"] = (
                    self.projection_accumulator.incremental(
                        state["projection_accumulator"], x_t, index, mask
                    )
                )
        x = counted_add(ctx, self.drop_path.apply(ctx, None, x), skip_1)
        return self._post_projection(
            ctx, params, state, x, mode, flush, next_gate=next_gate
        )

    def _post_projection(self, ctx, params, state, x, mode, flush,
                         mlp_norms=None, next_gate=None):
        """The MLP gate→op→buffer group, with its own fusion mode (the v2
        MLP kernel is the clearest per-shape win: the hidden activation
        never leaves VMEM). ``mlp_norms``: gate norms precomputed by an
        upstream fused kernel (the v3 projection kernel, or the v2/blocked
        projection group's norms emission). ``next_gate``: the NEXT block's
        (p_qkv, ln_scale, ln_bias) — the MLP kernel emits that gate's norms
        (cross-block pass sharing). Returns (x, next_norms)."""
        if mode == "blocked" and not flush:
            x, state, next_norms = self._blocked_group_mlp(
                ctx, params, state, x, norms=mlp_norms, next_gate=next_gate
            )
            return x, next_norms
        if mode in ("v2", "v2mlp", "v1v2", "v3") and not flush:
            x, state, next_norms = self._v2_group_mlp(
                ctx, params, state, x, norms=mlp_norms, next_gate=next_gate
            )
            return x, next_norms
        skip_2 = x
        if flush:
            if self.gate_before_ln:
                _, state["mlp_gate"] = self.mlp_gate.flush(state["mlp_gate"], x)
                x = layer_norm(x, params["mlp_layer_norm"], LN_EPS)
            else:
                x = layer_norm(x, params["mlp_layer_norm"], LN_EPS)
                _, state["mlp_gate"] = self.mlp_gate.flush(state["mlp_gate"], x)
            x = self._forward_mlp(ctx, params, x)
            x, state["mlp_accumulator"] = self.mlp_accumulator.flush(
                state["mlp_accumulator"], x
            )
        elif mode == "v1":
            x_t, index, mask, state["mlp_gate"] = self._fused_gate_select(
                ctx, state["mlp_gate"], x, self.mlp_gate.policy,
                params["mlp_layer_norm"],
            )
            x_t = self._forward_mlp(ctx, params, x_t, valid_frac=valid_fraction(mask))
            x, state["mlp_accumulator"] = self.mlp_accumulator.incremental(
                state["mlp_accumulator"], x_t, index, mask
            )
        else:
            x_t, index, mask, state["mlp_gate"] = self._gate_ln(
                ctx, params["mlp_layer_norm"], self.mlp_gate, state["mlp_gate"], x
            )
            x_t = self._forward_mlp(ctx, params, x_t, valid_frac=valid_fraction(mask))
            x, state["mlp_accumulator"] = self.mlp_accumulator.incremental(
                state["mlp_accumulator"], x_t, index, mask
            )
        x = counted_add(ctx, self.drop_path.apply(ctx, None, x), skip_2)
        return x, None


class EventfulMatmul1Block(EventfulTokenwiseBlock):
    """Adds eventfulness to the query-key product via an incrementally
    updated MatmulBuffer (reference blocks.py:466-540). Non-windowed only."""

    _attention_uses_index = True

    # q·kᵀ product strategy: the cached product is recomputable identically
    # (MatmulBuffer docstring) and the recompute costs FEWER FLOPs than the
    # scatter matmuls whenever head_dim < k-capacity (every reference
    # operating point), while killing the (B, H, N, Np) state carry —
    # profiled ~0.19 ms/frame/block of scatter+blend at ViTDet-672.
    # False restores the reference's cached+scatter formulation.
    recompute_product = True

    def __init__(self, **super_kwargs):
        super().__init__(**super_kwargs)
        if self.pool_size is not None:
            assert all(s % p == 0 for s, p in zip(self.input_size, self.pool_size))
        assert self.window_size is None
        self.matmul_accumulator_1 = MatmulBuffer()

    def _pooled_tokens(self, n_tokens):
        if self.pool_size is None:
            return n_tokens
        extra = n_tokens - prod(self.input_size)  # class tokens, if any
        return extra + prod(
            s // p for s, p in zip(self.input_size, self.pool_size)
        )

    def init_state(self, batch, n_tokens, dtype=jnp.float32):
        state = super().init_state(batch, n_tokens, dtype)
        if not self.recompute_product:
            n_p = self._pooled_tokens(n_tokens)
            state["matmul_accumulator_1"] = self.matmul_accumulator_1.init_state(
                (batch, self.heads, n_tokens, n_p), dtype
            )
        return state

    def _attention_flush(self, ctx, params, state, x, aux):
        a, v, state, _, _ = self._forward_matmul_1_flush(ctx, params, state, x, aux)
        a, ats_indices, state = self._adaptive_token_sampling(state, a, v)
        a, v, old_dtype = self._cast_matmul_2(a, v)
        x = counted_matmul(ctx, a, v)
        x = self._recombine_heads(x)
        x = self._uncast_matmul_2(x, old_dtype)
        return x, ats_indices, state

    def _attention_incremental(self, ctx, params, state, x, index, mask, aux):
        a, _, v, state, _, _ = self._forward_matmul_1_incremental(
            ctx, params, state, x, index, mask, aux
        )
        a, ats_indices, state = self._adaptive_token_sampling(state, a, v)
        a, v, old_dtype = self._cast_matmul_2(a, v)
        x = counted_matmul(ctx, a, v)
        x = self._recombine_heads(x)
        x = self._uncast_matmul_2(x, old_dtype)
        return x, ats_indices, state

    def _forward_matmul_1_flush(self, ctx, params, state, x, aux):
        q, k, v = self._partition_heads(x)
        k = self._pool_tokens(k)
        v = self._pool_tokens(v)
        if self.recompute_product:
            a = counted_matmul(ctx, q / self.scale, jnp.swapaxes(k, -2, -1))
        else:
            a, state["matmul_accumulator_1"] = self.matmul_accumulator_1.flush(
                ctx, state["matmul_accumulator_1"], q / self.scale,
                jnp.swapaxes(k, -2, -1),
            )
        a = self._matmul_1_post(ctx, params, a, q, aux)
        return a, v, state, None, None

    def _forward_matmul_1_incremental(
        self, ctx, params, state, x, index, mask, aux, softmax=True, bias=True,
        matmul=True,
    ):
        q, k, v = self._partition_heads(x)
        k = self._pool_tokens(k)
        v = self._pool_tokens(v)
        index_k, mask_k = self._pool_index(index, mask)
        if not matmul:
            # matmul-1 fused into the A·V kernel (see _av_recompute): the
            # logits never exist in HBM. Counts stay at the reference's two
            # incremental matmuls (MatmulBuffer.incremental_recompute
            # parity, modules.py:220-236).
            assert self.recompute_product and softmax is False
            d = q.shape[-1]
            nq, np_ = q.shape[-2], k.shape[-2]
            bh = q.size // (nq * d)
            ctx.add(
                "matmul_flops",
                valid_fraction(mask) * float(bh * index.shape[-1] * np_ * d),
            )
            ctx.add(
                "matmul_flops",
                valid_fraction(mask_k) * float(bh * nq * index_k.shape[-1] * d),
            )
            return (q, k), q, v, state, index_k, mask_k
        if self.recompute_product:
            a = self.matmul_accumulator_1.incremental_recompute(
                ctx, q / self.scale, jnp.swapaxes(k, -2, -1),
                index, index_k, mask, mask_k,
            )
        else:
            a, state["matmul_accumulator_1"] = self.matmul_accumulator_1.incremental(
                ctx,
                state["matmul_accumulator_1"],
                q / self.scale,
                jnp.swapaxes(k, -2, -1),
                index,
                index_k,
                mask,
                mask_k,
            )
        a = self._matmul_1_post(ctx, params, a, q, aux, softmax=softmax, bias=bias)
        return a, q, v, state, index_k, mask_k

    def _matmul_1_post(self, ctx, params, a, q, aux, softmax=True, bias=True):
        # ``bias=False`` / ``softmax=False`` defer the rel-pos bias and the
        # softmax to the fused A-V kernel (ops/pallas/av_softmax.py), which
        # computes them in-VMEM.
        if self.relative_position is not None and bias:
            derived = aux.get("relative") if aux else None
            a = self.relative_position.apply(
                ctx, params["relative_position"], a, q, derived=derived
            )
        return jax.nn.softmax(a, axis=-1) if softmax else a

    def _pool_index(self, index, mask):
        """Map token indices to pooled-grid indices, deduplicating like the
        reference's ``.unique()`` (blocks.py:525-540) via sort + run-length
        masking (static shapes)."""
        if self.pool_size is None or index is None:
            return index, mask
        width = self.input_size[1]
        index_y = index // width
        index_x = index % width
        index_y = index_y // self.pool_size[0]
        index_x = index_x // self.pool_size[1]
        pooled = index_y * (width // self.pool_size[1]) + index_x
        big = jnp.iinfo(jnp.int32).max
        key = pooled if mask is None else jnp.where(mask, pooled, big)
        s = jnp.sort(key, axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros_like(s[..., :1], bool), s[..., 1:] == s[..., :-1]], axis=-1
        )
        new_mask = ~dup & (s != big)
        return jnp.where(new_mask, s, 0).astype(jnp.int32), new_mask


class EventfulBlock(EventfulMatmul1Block):
    """Adds eventfulness to the attention-value product via delta
    accumulation (reference blocks.py:543-575)."""

    # A·V product strategy. The delta-accumulated product is pure
    # memoization: the update (reference modules.py:293-294) telescopes to
    #
    #   product' = product - Σ_{j∈S} a_old[:,j] ⊗ v_old[j]
    #                      + Σ_{j∈S} a_new[:,j] ⊗ v_new[j]
    #
    # so by induction ``product == p_a @ p_v`` identically at every step
    # (flush establishes it; each update swaps exactly the S terms — the
    # same argument as MatmulBuffer.incremental_recompute). Recomputing
    # replaces BOTH one-hot column gathers of the (B, H, N, Np) attention
    # matrix (N·Np·k MAC-FLOPs each — 51 GFLOP per global block at
    # ViTDet-1024), the put_cols scatter matmul + blend, the two gathered
    # delta matmuls and the (B, H, N, d) accumulator carry with two
    # elementwise selects and ONE dense N·Np·d matmul (d = 64 « k at every
    # reference operating point). Also duplicate-index-safe by construction
    # (select, not scatter-blend). Reported FLOP counts keep the
    # reference's gathered delta semantics. False restores the cached
    # accumulator formulation.
    recompute_av = True

    def __init__(self, **super_kwargs):
        super().__init__(**super_kwargs)
        self.v_gate = TokenDeltaGate()
        self.matmul_gate = TokenDeltaGate(structure="col")
        self.matmul_accumulator_2 = MatmulDeltaAccumulator()

    def init_state(self, batch, n_tokens, dtype=jnp.float32):
        state = super().init_state(batch, n_tokens, dtype)
        n_p = self._pooled_tokens(n_tokens)
        n_a = self.out_tokens(n_tokens)
        head_dim = self.dim // self.heads
        sdtype = _CAST_DTYPES.get(self.matmul_2_cast, dtype)
        state["v_gate"] = self.v_gate.init_state(
            (batch, self.heads, n_p, head_dim), sdtype
        )
        state["matmul_gate"] = self.matmul_gate.init_state(
            (batch, self.heads, n_a, n_p), sdtype
        )
        if not self.recompute_av:
            state["matmul_accumulator_2"] = self.matmul_accumulator_2.init_state(
                (batch, self.heads, n_a, head_dim), sdtype
            )
        return state

    def _attention_flush(self, ctx, params, state, x, aux):
        a, v, state, _, _ = self._forward_matmul_1_flush(ctx, params, state, x, aux)
        a, v, old_dtype = self._cast_matmul_2(a, v)
        a, ats_indices, state = self._adaptive_token_sampling(state, a, v)
        _, state["v_gate"] = self.v_gate.flush(state["v_gate"], v)
        _, state["matmul_gate"] = self.matmul_gate.flush(state["matmul_gate"], a)
        if self.recompute_av:
            x = counted_matmul(ctx, a, v)
        else:
            x, state["matmul_accumulator_2"] = self.matmul_accumulator_2.flush(
                ctx, state["matmul_accumulator_2"], a, v
            )
        x = self._recombine_heads(x)
        x = self._uncast_matmul_2(x, old_dtype)
        return x, ats_indices, state

    # Fused softmax->select->matmul A·V kernel (ops/pallas/av_softmax.py):
    # "auto" enables on TPU with recompute_av when the pooled column count
    # is lane-friendly (measured: ViTDet-1024 Np=1024 27.1 vs 29.9 ms/frame;
    # ViTDet-672 Np=441 pads to 512 lanes and the kernel LOSES 1.8 ms/frame
    # to the XLA softmax+select fusion chain — docs/PERF_NOTES.md round 3);
    # True forces (interpret off-TPU); False always unfused.
    av_kernel = "auto"
    # Fuse matmul-1 (q·kT) into the A-V kernel so the (B, H, N, Np) logits
    # never exist in HBM (~400 MB of pure traffic per global block-frame at
    # ViTDet-1024). "auto" (default) fuses whenever the A-V kernel itself
    # dispatches (same per-shape rule; the logits stop at that kernel
    # anyway) and matmul-1 runs in product-recompute mode. TPU-verified
    # round 4: parity exact on flush, bf16-level on incremental steps;
    # ViTDet-1024 eventful 24.1 -> 22.7 ms/frame (ratio 1.74 -> 1.85).
    # CPU-parity-tested in tests/test_pallas.py. False disables; True
    # forces (with av_kernel; interpret mode off-TPU).
    fuse_matmul_1 = "auto"
    AV_KERNEL_MIN_COLS = 512

    def _use_av_kernel(self, ctx, n_cols, batch=None):
        if (
            not self.recompute_av
            or self.ats_fraction is not None
            or ctx.training
            or self.av_kernel is False
        ):
            return False
        if self.av_kernel is True:
            return True
        # Per-shape/per-batch rule (measured, docs/PERF_NOTES.md): at
        # n_cols >= 512 the kernel always wins (ViTDet-1024). Below that
        # the 441 -> 512 lane padding loses to the XLA fusion chain at
        # batch >= 2 (672 2-stream: 12.2 vs 10.2 ms/frame even with
        # fuse_mm1) but WINS at batch 1 (6.47 -> 5.94 ms/frame), where the
        # removed logits materialization outweighs the padding.
        if n_cols < self.AV_KERNEL_MIN_COLS and (batch is None or batch > 1):
            return False
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False

    def _attention_incremental(self, ctx, params, state, x, index, mask, aux):
        use_kernel = self._use_av_kernel(
            ctx, self._pooled_tokens(x.shape[-2]), x.shape[0]
        )
        # The bias fuses at any shape (the kernel takes precomputed per-axis
        # TERMS and expands them in VMEM; no row-block tile-legality
        # constraint remains — see ops/pallas/av_softmax.py).
        fuse_bias = use_kernel and self.relative_position is not None
        fuse_mm1 = (
            self.fuse_matmul_1 is not False
            and use_kernel
            and self.recompute_product
        )
        a, q, v, state, index_k, mask_k = self._forward_matmul_1_incremental(
            ctx, params, state, x, index, mask, aux,
            softmax=not use_kernel, bias=not fuse_bias, matmul=not fuse_mm1,
        )
        if fuse_mm1:
            # matmul-2 cast applies to the A·V operands; the logits are
            # computed in f32 inside the kernel and the A state keeps its
            # (possibly cast) dtype, so only v needs casting here.
            qk, a = a, None
            old_dtype = None
            if self.matmul_2_cast is not None:
                old_dtype = v.dtype
                v = v.astype(_CAST_DTYPES[self.matmul_2_cast])
        else:
            qk = None
            a, v, old_dtype = self._cast_matmul_2(a, v)
        a, ats_indices, state = self._adaptive_token_sampling(state, a, v)
        if use_kernel:
            rel = None
            if fuse_bias:
                derived = aux.get("relative") if aux else None
                if derived is None:
                    derived = self.relative_position.precompute(
                        params["relative_position"]
                    )
                rel = (q, derived)
            x, state = self._av_recompute(
                ctx, state, a, v, index_k, mask_k, fuse_softmax=True, rel=rel,
                qk=qk,
            )
        elif self.recompute_av:
            x, state = self._av_recompute(ctx, state, a, v, index_k, mask_k)
        else:
            v_n_tilde, v_delta_tilde, index_v, mask_v, state["v_gate"] = (
                self.v_gate.incremental(
                    ctx, state["v_gate"], v, forced_index=index_k, forced_mask=mask_k
                )
            )
            a_n_tilde, a_delta_tilde, _, _, state["matmul_gate"] = (
                self.matmul_gate.incremental(
                    ctx, state["matmul_gate"], a,
                    forced_index=index_v, forced_mask=mask_v,
                )
            )
            x, state["matmul_accumulator_2"] = self.matmul_accumulator_2.incremental(
                ctx,
                state["matmul_accumulator_2"],
                a_n_tilde,
                v_n_tilde,
                a_delta_tilde,
                v_delta_tilde,
                mask=mask_v,
            )
        x = self._recombine_heads(x)
        x = self._uncast_matmul_2(x, old_dtype)
        return x, ats_indices, state

    def _av_recompute(self, ctx, state, a, v, index_k, mask_k, fuse_softmax=False,
                      rel=None, qk=None):
        """A·V via state recompute (see ``recompute_av``): two elementwise
        selects + one dense matmul replace the gathered delta pipeline.
        With ``fuse_softmax`` the chain runs as ONE Pallas kernel over the
        pre-softmax logits ``a`` (see av_kernel); with ``qk`` (the
        unscaled q and pooled k head tensors) matmul-1 also runs inside the
        kernel and ``a`` is None — the logits never exist in HBM. Counts
        mirror the reference's delta formulation exactly (modules.py:285-295
        + the two gate passes, modules.py:148)."""
        from eventful_transformer_tpu.core.indexing import (
            coverage,
            select_cols,
            select_rows,
        )

        p_a_state = state["matmul_gate"]["p"]  # same shape as the logits
        ctx.add("gate_flops", float(v.size))  # v_gate error pass
        p_v = select_rows(state["v_gate"]["p"], v, index_k, mask_k)
        state["v_gate"] = {"p": p_v}
        ctx.add("gate_flops", float(p_a_state.size))  # matmul_gate error pass
        if fuse_softmax:
            from eventful_transformer_tpu.ops.pallas.av_softmax import (
                softmax_select_matmul,
            )

            interpret = jax.devices()[0].platform == "cpu"
            cov = coverage(
                index_k, mask_k, p_a_state.shape[-1], index_k.ndim + 1
            )
            kw = {}
            if rel is not None:
                # rel-pos bias fused into the kernel: the decomposed
                # per-axis terms are contracted here in XLA (thin einsums
                # over UNSCALED q, counted by bias_terms with the
                # reference's einsum keys) and expanded onto the logits
                # inside the kernel with an exact 0/1 matmul.
                q, derived = rel
                kw = dict(
                    terms=self.relative_position.bias_terms(ctx, q, derived),
                    p=self.relative_position._pooled_size(),
                )
                # reference-parity counts for the two broadcast adds
                # (RelativePositionEmbedding.apply's add path)
                ctx.add("add_flops", 2.0 * p_a_state.size)
            if qk is not None:
                kw["q"] = qk[0]
                kw["k"] = qk[1]
                kw["inv_scale"] = 1.0 / self.scale
            p_a, x = softmax_select_matmul(
                a, p_a_state, cov, p_v, interpret=interpret, **kw
            )
            state["matmul_gate"] = {"p": p_a}
        else:
            p_a = select_cols(p_a_state, a, index_k, mask_k)
            state["matmul_gate"] = {"p": p_a}
            x = jnp.matmul(p_a, p_v, preferred_element_type=p_a.dtype)
        frac = valid_fraction(mask_k)
        kcap = index_k.shape[-1]
        batch_heads = p_a_state.size // (p_a_state.shape[-2] * p_a_state.shape[-1])
        out_size = float(batch_heads * p_a_state.shape[-2] * v.shape[-1])
        # reference counts: accumulator bookkeeping + two gathered matmuls
        ctx.add(
            "accumulator_flops",
            frac * float(batch_heads * kcap * v.shape[-1]) + 2.0 * out_size,
        )
        ctx.add("matmul_flops", 2.0 * frac * out_size * kcap)
        return x, state


BLOCK_CLASSES = {
    "Block": Block,
    "EventfulTokenwiseBlock": EventfulTokenwiseBlock,
    "EventfulMatmul1Block": EventfulMatmul1Block,
    "EventfulBlock": EventfulBlock,
}
