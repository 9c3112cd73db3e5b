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
        return {"blocks": states}

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
        config) — then the stack is executed as ONE ``lax.scan`` over stacked
        layer parameters: a 12x smaller program for ViViT-B, much faster XLA
        compiles, identical numerics."""
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

    def apply(self, ctx, params, state, x, aux=None):
        if aux is None:
            aux = self.precompute(params)
        x = self.position_encoding.apply(
            ctx, params["position_encoding"], x, aux["position_encoding"]
        )
        if len(self.blocks) > 1 and self.homogeneous:
            return self._apply_scanned(ctx, params, state, x, aux)
        new_states = []
        for i, block in enumerate(self.blocks):
            x, s = block.apply(
                ctx, params["blocks"][i], state["blocks"][i], x, aux["blocks"][i]
            )
            new_states.append(s)
        return x, {"blocks": new_states}

    def _apply_scanned(self, ctx, params, state, x, aux):
        import jax

        from eventful_transformer_tpu.core import counting

        block = self.blocks[0]
        stack = lambda *xs: jnp.stack(xs)
        layer_params = jax.tree_util.tree_map(stack, *params["blocks"])
        layer_state = jax.tree_util.tree_map(stack, *state["blocks"])
        layer_aux = jax.tree_util.tree_map(stack, *aux["blocks"])

        def body(ctx, carry, layer):
            p, s, a = layer
            y, s = block.apply(ctx, p, s, carry, a)
            return y, s

        x, states = counting.scan(body, ctx, x, (layer_params, layer_state, layer_aux))
        unstacked = [
            jax.tree_util.tree_map(lambda s, i=i: s[i], states)
            for i in range(len(self.blocks))
        ]
        return x, {"blocks": unstacked}
