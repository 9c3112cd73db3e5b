"""ViT backbone: position encoding + block stack
(reference eventful_transformer/backbones.py:8-64).

Block classes are selected by NAME from the config (reference
backbones.py:58), which is how YAML picks dense vs. eventful variants.
"""

from __future__ import annotations

from math import prod

import jax.numpy as jnp

from eventful_transformer_tpu.core.blocks import BLOCK_CLASSES
from eventful_transformer_tpu.core.embeddings import PositionEncoding
from eventful_transformer_tpu.core.nn import Module


class ViTBackbone(Module):
    def __init__(
        self,
        block_config,
        depth,
        position_encoding_size,
        input_size,
        block_class="Block",
        has_class_token=False,
        window_indices=(),
        windowed_class=None,
        windowed_overrides=None,
    ):
        self.input_size = tuple(input_size)
        self.has_class_token = has_class_token
        self.position_encoding = PositionEncoding(
            block_config["dim"], position_encoding_size, input_size, has_class_token
        )
        self.blocks = []
        for i in range(depth):
            block_class_i = block_class
            block_config_i = dict(block_config)
            if i in window_indices:
                if windowed_class is not None:
                    block_class_i = windowed_class
                if windowed_overrides is not None:
                    block_config_i.update(windowed_overrides)
            else:
                block_config_i["window_size"] = None
            self.blocks.append(
                BLOCK_CLASSES[block_class_i](input_size=input_size, **block_config_i)
            )

    @property
    def n_tokens(self):
        return prod(self.input_size) + int(self.has_class_token)

    def init(self, key):
        modules = {"position_encoding": self.position_encoding}
        modules.update({f"block_{i}": b for i, b in enumerate(self.blocks)})
        params = self.sub_init(key, modules)
        params["blocks"] = [params.pop(f"block_{i}") for i in range(len(self.blocks))]
        return params

    def init_state(self, batch, dtype=jnp.float32):
        states = []
        n = self.n_tokens
        for block in self.blocks:
            states.append(block.init_state(batch, n, dtype))
            n = block.out_tokens(n)
        if self._scan_layers:
            # Layer-scanned stacks keep the state STACKED end-to-end so the
            # per-frame scan neither re-stacks nor unstacks it (each is a
            # full copy of hundreds of MB of gate/buffer state per frame —
            # measured dominant).
            import jax

            return {"blocks_stacked": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states
            )}
        return {"blocks": states}

    @property
    def _scan_layers(self):
        """Run the stack as one lax.scan over layers vs an unrolled loop.

        Scan: 12x smaller program, much faster compiles — the default for
        dense/CPU. Unrolled: per-block state arrays are separate while-loop
        carry leaves that XLA aliases directly into (Pallas) kernel I/O; the
        layer scan instead slices xs / update-slices ys, copies that cannot
        fuse into an opaque pallas_call. Measured on TPU v5e (ViViT-B k=98,
        bf16): eventful 29.1 -> 42.8 clips/s unrolled, dense unchanged.
        Override with EVT_UNROLL_BLOCKS=1 / =0.
        """
        import os

        if len(self.blocks) <= 1 or not self.homogeneous:
            return False
        env = os.environ.get("EVT_UNROLL_BLOCKS")
        if env == "1":
            return False
        if env == "0":
            return True
        first = self.blocks[0]
        stateful = isinstance(first, tuple(
            c for c in BLOCK_CLASSES.values() if c is not BLOCK_CLASSES["Block"]
        ))
        if stateful:
            try:
                import jax

                if jax.devices()[0].platform not in ("cpu",):
                    return False  # unroll eventful stacks on accelerators
            except Exception:
                pass
        return True

    def precompute(self, params):
        """Hoist loop-invariant derived arrays (sized position encoding,
        relative-position tables) out of the per-frame scan."""
        return {
            "position_encoding": self.position_encoding.precompute(
                params["position_encoding"]
            ),
            "blocks": [
                block.precompute(p) for block, p in zip(self.blocks, params["blocks"])
            ],
        }

    @property
    def homogeneous(self):
        """True when every block is interchangeable (same class and static
        config) — a precondition for running the stack as ONE ``lax.scan``
        over stacked layer parameters (see _scan_layers)."""
        first = self.blocks[0]
        if first.ats_fraction is not None:
            return False  # ATS shrinks token counts per block: shapes differ
        return all(
            type(b) is type(first) and vars(b).keys() == vars(first).keys()
            and all(
                vars(b)[k] == vars(first)[k]
                for k in vars(b)
                if isinstance(vars(b)[k], (int, float, str, tuple, bool, type(None)))
            )
            for b in self.blocks[1:]
        )

    def apply(self, ctx, params, state, x, aux=None, mode=None):
        """``mode``: static flush/incremental selection for eventful blocks
        (see Block.apply) — per-video scans split flush-then-scan so the hot
        loop carries no per-block lax.cond."""
        if aux is None:
            aux = self.precompute(params)
        x = self.position_encoding.apply(
            ctx, params["position_encoding"], x, aux["position_encoding"]
        )
        if "blocks_stacked" in state:
            return self._apply_scanned(ctx, params, state, x, aux, mode)
        new_states = []
        norms_carry = None
        for i, block in enumerate(self.blocks):
            give = None
            if mode == "incremental" and i + 1 < len(self.blocks):
                give = self._next_gate_info(
                    block, self.blocks[i + 1], x,
                    state["blocks"][i + 1], params["blocks"][i + 1],
                )
            out = block.apply(
                ctx, params["blocks"][i], state["blocks"][i], x, aux["blocks"][i],
                mode=mode,
                **(
                    dict(qkv_norms=norms_carry, next_gate=give)
                    if (norms_carry is not None or give is not None)
                    else {}
                ),
            )
            if give is not None:
                x, s, norms_carry = out
            else:
                x, s = out
                norms_carry = None
            new_states.append(s)
        return x, {"blocks": new_states}

    @staticmethod
    def _next_gate_info(block, nxt, x, next_state, next_params):
        """Cross-block gate-pass sharing eligibility (docs/PERF_NOTES.md
        round 4): block i's MLP group kernel emits block i+1's qkv-gate
        selection norms from the output block in VMEM, saving the next
        norms pass's re-read of the activation from HBM. Requires: both
        blocks eventful-tokenwise with kernel-fused gate groups, gate after
        LN (post-domain norms), no ATS/STGT/drop-path (fused modes exclude
        those), matching token counts, and an L2 top-k/threshold policy
        (all norms-consuming)."""
        from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock

        for b in (block, nxt):
            if not isinstance(b, EventfulTokenwiseBlock):
                return None
            if b.gate_before_ln or b.stgt or b.ats_fraction is not None:
                return None
            if getattr(b, "share_gate_passes", False) is False:
                return None
        n = x.shape[-2]
        if block.out_tokens(n) != n:
            return None
        # v2mlp is EXCLUDED: its qkv consumer computes norms inside an XLA
        # fusion that costs less than the emission adds to the MLP kernel
        # (measured ViViT k=98: 1.076x no-share vs 1.041x shared —
        # docs/PERF_NOTES.md round 4). Only the v2/blocked/v4 consumers,
        # whose norms are a separate ln_norms kernel pass, can win (v4's
        # kernel C is gate_group_mlp, the same emitter).
        if block._fused_mode(n) not in ("v2", "blocked", "v4"):
            return None
        if getattr(nxt.qkv_gate.policy, "order", 2) != 2:
            return None
        p_next = next_state.get("qkv_gate", {}).get("p")
        if p_next is None or p_next.shape[-1] != block.dim:
            return None
        ln = next_params["input_layer_norm"]
        return (p_next, ln["scale"], ln["bias"])

    def _apply_scanned(self, ctx, params, state, x, aux, mode=None):
        import jax

        from eventful_transformer_tpu.core import counting

        block = self.blocks[0]
        stack = lambda *xs: jnp.stack(xs)
        # Params and aux are loop-invariant (XLA hoists the stacking out of
        # the enclosing frame scan); the STATE stays stacked across frames
        # (init_state) so no per-frame restack/unstack copies happen.
        layer_params = jax.tree_util.tree_map(stack, *params["blocks"])
        layer_aux = jax.tree_util.tree_map(stack, *aux["blocks"])

        def body(ctx, carry, layer):
            p, s, a = layer
            y, s = block.apply(ctx, p, s, carry, a, mode=mode)
            return y, s

        x, states = counting.scan(
            body, ctx, x, (layer_params, state["blocks_stacked"], layer_aux)
        )
        return x, {"blocks_stacked": states}
