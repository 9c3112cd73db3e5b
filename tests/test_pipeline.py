"""Pipeline parallelism (parallel/pipeline.py) vs the sequential frame scan:
exact output + state parity for dense and eventful stacks on a virtual
CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.core.backbones import ViTBackbone
from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.core.policies import TokenNormTopK
from eventful_transformer_tpu.parallel.mesh import make_mesh
from eventful_transformer_tpu.parallel.pipeline import make_pipelined_backbone
from eventful_transformer_tpu.utils.misc import set_policies

B, N, C, T, DEPTH = 2, 24, 32, 5, 4


def _build(block_class):
    backbone = ViTBackbone(
        block_config=dict(dim=C, heads=4, mlp_ratio=2),
        depth=DEPTH,
        position_encoding_size=[4, 6],
        input_size=(4, 6),
        block_class=block_class,
    )
    if block_class != "Block":
        set_policies(backbone, TokenNormTopK, k=8)
    params = backbone.init(jax.random.PRNGKey(0))
    return backbone, params


def _sequential(backbone, params, frames):
    """Frame loop over the UNROLLED block list (ground truth)."""
    n = backbone.n_tokens
    state = [blk.init_state(B, n) for blk in backbone.blocks]
    outs = []
    for t in range(frames.shape[0]):
        x = frames[t]
        new_state = []
        for blk, p, s in zip(backbone.blocks, params["blocks"], state):
            x, s = blk.apply(Ctx(), p, s, x)
            new_state.append(s)
        state = new_state
        outs.append(x)
    return jnp.stack(outs), state


def _run_pipeline(backbone, params, frames, n_stages):
    mesh = make_mesh((n_stages,), ("pipe",), devices=jax.devices()[:n_stages])
    run = make_pipelined_backbone(backbone, mesh, axis="pipe")
    n = backbone.n_tokens
    state = {"blocks": [blk.init_state(B, n) for blk in backbone.blocks]}
    return run(params, state, frames)


class TestPipeline:
    def test_dense_matches_sequential(self, rng):
        backbone, params = _build("Block")
        frames = jnp.asarray(rng.standard_normal((T, B, N, C)).astype(np.float32))
        want, _ = _sequential(backbone, params, frames)
        got, _ = _run_pipeline(backbone, params, frames, n_stages=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_eventful_state_survives_bubble(self, rng):
        """Eventful gates carry temporal state; the pipeline's fill/drain
        bubble must not disturb it (masked state updates)."""
        backbone, params = _build("EventfulTokenwiseBlock")
        base = rng.standard_normal((B, N, C)).astype(np.float32)
        frames = jnp.asarray(
            np.stack([base + 0.1 * t * rng.standard_normal((B, N, C)).astype(np.float32)
                      for t in range(T)])
        )
        want, want_state = _sequential(backbone, params, frames)
        got, got_state = _run_pipeline(backbone, params, frames, n_stages=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
        for s_got, s_want in zip(got_state["blocks"], want_state):
            flat_g = jax.tree_util.tree_leaves(s_got)
            flat_w = jax.tree_util.tree_leaves(s_want)
            for g, w in zip(flat_g, flat_w):
                np.testing.assert_allclose(
                    np.asarray(g, np.float32), np.asarray(w, np.float32),
                    rtol=1e-4, atol=1e-5,
                )


class TestUlyssesAttention:
    def test_matches_single_device(self, rng):
        """Sequence-parallel attention (tokens sharded, two all-to-alls)
        equals the single-device attention exactly."""
        from math import sqrt

        from eventful_transformer_tpu.parallel.sequence import make_ulysses_attention

        B_, N_, C_, H_ = 2, 32, 64, 8
        scale = sqrt(C_ // H_)
        qkv = jnp.asarray(rng.standard_normal((B_, N_, 3 * C_)).astype(np.float32))

        def single(qkv):
            x = qkv.reshape(B_, N_, 3, H_, C_ // H_)
            q, k, v = jnp.transpose(x, (2, 0, 3, 1, 4))
            a = jax.nn.softmax(
                jnp.matmul(q / scale, jnp.swapaxes(k, -2, -1),
                           preferred_element_type=jnp.float32),
                axis=-1,
            ).astype(qkv.dtype)
            o = jnp.matmul(a, v, preferred_element_type=jnp.float32).astype(qkv.dtype)
            return jnp.transpose(o, (0, 2, 1, 3)).reshape(B_, N_, C_)

        mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
        fn = make_ulysses_attention(H_, scale, mesh, axis="seq")
        got = fn(qkv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(single(qkv)), rtol=1e-5, atol=1e-5
        )
