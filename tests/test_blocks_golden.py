"""Block-level golden-parity tests: dense and eventful blocks vs. the
reference PyTorch implementation, identical weights and inputs, multi-frame
sequences, output and FLOP-count parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from eventful_transformer_tpu.core.blocks import (  # noqa: E402
    Block,
    EventfulBlock,
    EventfulMatmul1Block,
    EventfulTokenwiseBlock,
)
from eventful_transformer_tpu.core.counting import Counts, Ctx  # noqa: E402
from eventful_transformer_tpu.core.policies import TokenNormTopK  # noqa: E402
from tests.ref_loader import load_reference, torch_block_params  # noqa: E402

REF = load_reference()

DIM, HEADS, MLP = 24, 3, 2


def _seed_torch_block(cls, **kwargs):
    torch.manual_seed(0)
    block = cls(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
    for p in block.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.1)
    block.eval()
    return block


def _set_ref_policies(block, k):
    for cls in (REF.modules.SimpleSTGTGate, REF.modules.TokenDeltaGate, REF.modules.TokenGate):
        for m in block.modules():
            if type(m) is cls:
                m.policy = REF.policies.TokenNormTopK(k)


def _set_our_policies(block, k):
    for gate in [
        g
        for g in vars(block).values()
        if g.__class__.__name__.endswith("Gate")
    ]:
        gate.policy = TokenNormTopK(k)


class TestDenseBlockGolden:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(input_size=(4, 6)),
            dict(input_size=(4, 6), relative_embedding_size=(4, 6)),
            dict(input_size=(8, 8), window_size=(4, 4), relative_embedding_size=(3, 3)),
            dict(input_size=(7, 5), window_size=(4, 4)),  # padding path
            dict(input_size=(8, 8), pool_size=2),
            dict(input_size=(8, 8), pool_size=2, relative_embedding_size=(4, 4)),
            dict(input_size=(4, 6), matmul_2_cast="bfloat16"),
        ],
    )
    def test_matches_reference(self, rng, kwargs):
        ref_block = _seed_torch_block(REF.blocks.Block, **kwargs)
        ours = Block(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
        params = torch_block_params(ref_block)
        n = kwargs["input_size"][0] * kwargs["input_size"][1]
        x = rng.standard_normal((2, n, DIM)).astype(np.float32)
        with torch.inference_mode():
            want = ref_block(torch.from_numpy(x.copy())).numpy()
        got, _ = ours.apply(Ctx(), params, {}, jnp.asarray(x))
        tol = 2e-2 if kwargs.get("matmul_2_cast") else 2e-5
        np.testing.assert_allclose(np.asarray(got), want, rtol=tol, atol=tol)

    def test_count_parity(self, rng):
        kwargs = dict(input_size=(8, 8), window_size=(4, 4), relative_embedding_size=(3, 3))
        ref_block = _seed_torch_block(REF.blocks.Block, **kwargs)
        ours = Block(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
        params = torch_block_params(ref_block)
        x = rng.standard_normal((2, 64, DIM)).astype(np.float32)
        ref_block.counting()
        with torch.inference_mode():
            ref_block(torch.from_numpy(x.copy()))
        ctx = Ctx(count_mode=True)
        ours.apply(ctx, params, {}, jnp.asarray(x))
        ref_counts = dict(ref_block.total_counts())
        our_counts = Counts.from_device(ctx.counts).nonzero()
        assert our_counts == ref_counts


class TestEventfulBlocksGolden:
    @pytest.mark.parametrize(
        "cls_name,kwargs",
        [
            ("EventfulTokenwiseBlock", dict(input_size=(4, 6))),
            ("EventfulTokenwiseBlock", dict(input_size=(4, 6), gate_before_ln=True)),
            ("EventfulTokenwiseBlock", dict(input_size=(4, 6), stgt=True)),
            (
                "EventfulTokenwiseBlock",
                dict(input_size=(8, 8), window_size=(4, 4), relative_embedding_size=(3, 3)),
            ),
            # ragged window padding path (7x5 tokens, 4x4 windows)
            ("EventfulTokenwiseBlock", dict(input_size=(7, 5), window_size=(4, 4))),
            ("EventfulMatmul1Block", dict(input_size=(4, 6))),
            ("EventfulMatmul1Block", dict(input_size=(8, 8), pool_size=2)),
            ("EventfulBlock", dict(input_size=(4, 6))),
            ("EventfulBlock", dict(input_size=(4, 6), relative_embedding_size=(4, 6))),
            ("EventfulBlock", dict(input_size=(8, 8), pool_size=2)),
        ],
    )
    def test_multi_frame_parity(self, rng, cls_name, kwargs):
        k = 8
        ref_cls = getattr(REF.blocks, cls_name)
        our_cls = {
            "EventfulTokenwiseBlock": EventfulTokenwiseBlock,
            "EventfulMatmul1Block": EventfulMatmul1Block,
            "EventfulBlock": EventfulBlock,
        }[cls_name]
        ref_block = _seed_torch_block(ref_cls, **kwargs)
        ours = our_cls(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
        params = torch_block_params(ref_block)
        _set_ref_policies(ref_block, k)
        _set_our_policies(ours, k)
        n = kwargs["input_size"][0] * kwargs["input_size"][1]
        state = ours.init_state(1, n)
        base = rng.standard_normal((1, n, DIM)).astype(np.float32)
        ref_block.counting()
        ctx = Ctx(count_mode=True)
        for t in range(4):
            x = base + 0.1 * t * rng.standard_normal((1, n, DIM)).astype(np.float32)
            with torch.inference_mode():
                want = ref_block(torch.from_numpy(x.copy())).numpy()
            got, state = ours.apply(ctx, params, state, jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-3, atol=1e-4,
                err_msg=f"{cls_name} {kwargs} frame {t}",
            )
        # FLOP-count parity (pooled variants use capacity-masked dedup whose
        # counts can differ by the duplicate fraction; exact elsewhere).
        ref_counts = dict(ref_block.total_counts())
        our_counts = Counts.from_device(ctx.counts).nonzero()
        if kwargs.get("pool_size") is None:
            for key, val in ref_counts.items():
                assert our_counts[key] == pytest.approx(val, rel=1e-6), key

    @pytest.mark.parametrize(
        "cls_name,kwargs",
        [
            ("EventfulMatmul1Block", dict(input_size=(4, 6))),
            ("EventfulBlock", dict(input_size=(8, 8), pool_size=2)),
        ],
    )
    def test_recompute_product_matches_buffered(self, rng, cls_name, kwargs):
        """recompute_product=True (stateless q·kT, the TPU default) is
        bit-identical to the reference's cached+scatter formulation,
        including FLOP counts."""
        our_cls = {
            "EventfulMatmul1Block": EventfulMatmul1Block,
            "EventfulBlock": EventfulBlock,
        }[cls_name]
        n = kwargs["input_size"][0] * kwargs["input_size"][1]
        import jax.random

        base = rng.standard_normal((2, n, DIM)).astype(np.float32)
        frames = [
            base + 0.1 * t * rng.standard_normal((2, n, DIM)).astype(np.float32)
            for t in range(4)
        ]
        outs, counts = [], []
        for recompute in (True, False):
            blk = our_cls(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
            blk.recompute_product = recompute
            _set_our_policies(blk, 8)
            params = blk.init(jax.random.PRNGKey(0))
            state = blk.init_state(2, n)
            ctx = Ctx(count_mode=True)
            ys = []
            for x in frames:
                y, state = blk.apply(ctx, params, state, jnp.asarray(x))
                ys.append(np.asarray(y))
            outs.append(ys)
            counts.append(Counts.from_device(ctx.counts).nonzero())
        for t, (a, b) in enumerate(zip(*outs)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")
        for key in set(counts[0]) | set(counts[1]):
            assert counts[0][key] == pytest.approx(counts[1][key], rel=1e-6), key

    def test_full_budget_matches_dense(self, rng):
        """Eventful blocks at full token budget degrade to the dense
        computation (the reference's correctness-by-construction property,
        SURVEY.md §4.1)."""
        kwargs = dict(input_size=(4, 6))
        n = 24
        ref_dense = _seed_torch_block(REF.blocks.Block, **kwargs)
        ours = EventfulBlock(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
        params = torch_block_params(ref_dense)
        _set_our_policies(ours, n)
        state = ours.init_state(2, n)
        for t in range(3):
            x = rng.standard_normal((2, n, DIM)).astype(np.float32)
            with torch.inference_mode():
                want = ref_dense(torch.from_numpy(x.copy())).numpy()
            got, state = ours.apply(Ctx(), params, state, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-4)


class TestPositionEmbeddingsGolden:
    def test_position_encoding_resized(self, rng):
        from eventful_transformer_tpu.core.embeddings import PositionEncoding

        torch.manual_seed(1)
        ref = REF.utils.PositionEncoding(
            dim=DIM, encoding_size=(4, 4), input_size=(6, 7), has_class_token=True
        )
        with torch.no_grad():
            ref.encoding.copy_(torch.randn_like(ref.encoding))
        ref.eval()
        ours = PositionEncoding(DIM, (4, 4), (6, 7), has_class_token=True)
        params = {"encoding": jnp.asarray(ref.encoding.detach().numpy())}
        x = rng.standard_normal((2, 43, DIM)).astype(np.float32)
        with torch.inference_mode():
            want = ref(torch.from_numpy(x.copy())).numpy()
        got = ours.apply(Ctx(), params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_relative_position_embedding(self, rng):
        from eventful_transformer_tpu.core.embeddings import RelativePositionEmbedding

        head_dim = DIM // HEADS
        att, emb, pool = (8, 8), (5, 5), (2, 2)
        torch.manual_seed(2)
        ref = REF.utils.RelativePositionEmbedding(att, emb, head_dim, pool_size=pool)
        with torch.no_grad():
            ref.y_embedding.copy_(torch.randn_like(ref.y_embedding))
            ref.x_embedding.copy_(torch.randn_like(ref.x_embedding))
        ref.eval()
        ours = RelativePositionEmbedding(att, emb, head_dim, pool_size=pool)
        params = {
            "y_embedding": jnp.asarray(ref.y_embedding.detach().numpy()),
            "x_embedding": jnp.asarray(ref.x_embedding.detach().numpy()),
        }
        n, np_ = 64, 16
        x = rng.standard_normal((2, HEADS, n, np_)).astype(np.float32)
        q = rng.standard_normal((2, HEADS, n, head_dim)).astype(np.float32)
        with torch.inference_mode():
            want = ref(torch.from_numpy(x.copy()), torch.from_numpy(q), inplace=False).numpy()
        got = ours.apply(Ctx(), params, jnp.asarray(x), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
        # the fused Pallas bias+add kernel (interpret mode on CPU), with
        # FLOP-count parity against the XLA path
        from eventful_transformer_tpu.core.counting import Counts

        ctx_a, ctx_b = Ctx(count_mode=True), Ctx(count_mode=True)
        ours.use_pallas_kernel = False
        xla = ours.apply(ctx_a, params, jnp.asarray(x), jnp.asarray(q))
        ours.use_pallas_kernel = True
        ker = ours.apply(ctx_b, params, jnp.asarray(x), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(ker), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(xla), rtol=1e-5, atol=1e-6)
        ca, cb = Counts.from_device(ctx_a.counts), Counts.from_device(ctx_b.counts)
        for key in ca:
            assert cb[key] == pytest.approx(ca[key], rel=1e-6), key
        # the v2 flat-layout row-block kernel (the production TPU path)
        ours.use_pallas_kernel = "v2"
        ctx_v2 = Ctx(count_mode=True)
        ker2 = ours.apply(ctx_v2, params, jnp.asarray(x), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(ker2), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ker2), np.asarray(xla), rtol=1e-5, atol=1e-6
        )
        cv2 = Counts.from_device(ctx_v2.counts)
        for key in ca:
            assert cv2[key] == pytest.approx(ca[key], rel=1e-6), key
        # the flat-matmul bias path (the TPU layout fix: dense q @ tableᵀ +
        # exact masked-collapse matmuls, no 5-D views), with count parity
        ours.use_pallas_kernel = False
        ours.use_flat_matmul = True
        ctx_c = Ctx(count_mode=True)
        flat = ours.apply(ctx_c, params, jnp.asarray(x), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(flat), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(flat), np.asarray(xla), rtol=1e-5, atol=1e-6
        )
        cc = Counts.from_device(ctx_c.counts)
        for key in ca:
            assert cc[key] == pytest.approx(ca[key], rel=1e-6), key

    def test_pool_matrix_matches_reshape_mean(self, rng):
        """Matmul pooling (the TPU layout fix) == 6-D reshape+mean."""
        from eventful_transformer_tpu.core.blocks import Block, _pool_matrix

        blk = Block(dim=DIM, heads=HEADS, mlp_ratio=MLP, input_size=(6, 4),
                    pool_size=2)
        x = jnp.asarray(rng.standard_normal((2, 3, 24, 16)).astype(np.float32))
        want = blk._pool_tokens(x)  # CPU -> reshape+mean path
        got = jnp.matmul(_pool_matrix((6, 4), (2, 2), x.dtype), x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
        )

    def test_relative_position_flat_matmul_unpooled(self, rng):
        """Flat-matmul path == einsum path, unpooled, non-square grid."""
        from eventful_transformer_tpu.core.embeddings import RelativePositionEmbedding

        head_dim = 16
        att = (4, 6)
        ours = RelativePositionEmbedding(att, att, head_dim)
        params = {
            "y_embedding": jnp.asarray(
                rng.standard_normal((2 * att[0] - 1, head_dim)).astype(np.float32)
            ),
            "x_embedding": jnp.asarray(
                rng.standard_normal((2 * att[1] - 1, head_dim)).astype(np.float32)
            ),
        }
        n = att[0] * att[1]
        x = jnp.asarray(rng.standard_normal((2, 3, n, n)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((2, 3, n, head_dim)).astype(np.float32))
        ours.use_flat_matmul = False
        want = ours.apply(Ctx(), params, x, q)
        ours.use_flat_matmul = True
        got = ours.apply(Ctx(), params, x, q)
        # the q·table dot accumulates in a different order than the einsum
        # path -> f32 ulp-level differences
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestThresholdPolicyInBlock:
    def test_threshold_multi_frame_golden(self, rng):
        """Threshold policy (variable-k in the reference, fixed capacity +
        mask here) at the block level, batch 1 (the reference's constraint,
        policies.py:25)."""
        from eventful_transformer_tpu.core.policies import TokenNormThreshold

        kwargs = dict(input_size=(4, 6))
        ref_block = _seed_torch_block(REF.blocks.EventfulTokenwiseBlock, **kwargs)
        ours = EventfulTokenwiseBlock(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
        params = torch_block_params(ref_block)
        for m in ref_block.modules():
            if type(m) is REF.modules.TokenGate:
                m.policy = REF.policies.TokenNormThreshold(1.5)
        for gate in (ours.qkv_gate, ours.projection_gate, ours.mlp_gate):
            gate.policy = TokenNormThreshold(1.5)
        state = ours.init_state(1, 24)
        base = rng.standard_normal((1, 24, DIM)).astype(np.float32)
        for t in range(4):
            x = base + 0.2 * t * rng.standard_normal((1, 24, DIM)).astype(np.float32)
            with torch.inference_mode():
                want = ref_block(torch.from_numpy(x.copy())).numpy()
            got, state = ours.apply(Ctx(), params, state, jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-3, atol=1e-4, err_msg=f"frame {t}"
            )


class TestFusedGateGroup:
    @pytest.mark.parametrize(
        "fused_mode", ["v1", "v2", "v2mlp", "v3", "v2-topk", "v2mlp-topk"]
    )
    def test_fused_matches_reference(self, rng, fused_mode):
        """The Pallas fused gate paths (interpret mode on CPU) are
        golden-exact incl. FLOP-count parity, both LN placements.
        The -topk variants run the selection INSIDE the group kernels
        (cov=None; blocks.py::in_kernel_topk)."""
        in_kernel = fused_mode.endswith("-topk")
        fused_mode = fused_mode.removesuffix("-topk")
        for kwargs in (dict(input_size=(4, 6)), dict(input_size=(4, 6), gate_before_ln=True)):
            ref_block = _seed_torch_block(REF.blocks.EventfulTokenwiseBlock, **kwargs)
            ours = EventfulTokenwiseBlock(dim=DIM, heads=HEADS, mlp_ratio=MLP, **kwargs)
            ours.fused_gates = fused_mode  # force; CPU -> interpret mode
            ours.in_kernel_topk = in_kernel
            params = torch_block_params(ref_block)
            _set_ref_policies(ref_block, 8)
            _set_our_policies(ours, 8)
            state = ours.init_state(1, 24)
            base = rng.standard_normal((1, 24, DIM)).astype(np.float32)
            ref_block.counting()
            ctx = Ctx(count_mode=True)
            for t in range(3):
                x = base + 0.1 * t * rng.standard_normal((1, 24, DIM)).astype(np.float32)
                with torch.inference_mode():
                    want = ref_block(torch.from_numpy(x.copy())).numpy()
                got, state = ours.apply(ctx, params, state, jnp.asarray(x))
                np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)
            ref_counts = dict(ref_block.total_counts())
            our_counts = Counts.from_device(ctx.counts).nonzero()
            for key, val in ref_counts.items():
                assert our_counts[key] == pytest.approx(val, rel=1e-4), key


def test_pool_strided_matches_reshape_mean(rng):
    """The strided slice-add pooling formulation == reshape+mean (f32
    accumulation), including non-square pools and rectangular grids."""
    from eventful_transformer_tpu.core.blocks import Block

    for input_size, pool in (((8, 8), (2, 2)), ((6, 8), (3, 2))):
        blk_a = Block(dim=32, heads=4, mlp_ratio=2, input_size=input_size,
                      pool_size=list(pool))
        blk_b = Block(dim=32, heads=4, mlp_ratio=2, input_size=input_size,
                      pool_size=list(pool))
        blk_a.pool_mode = "matmul"  # falls to reshape+mean on CPU
        blk_b.pool_mode = "strided"
        n = input_size[0] * input_size[1]
        x = jnp.asarray(rng.standard_normal((2, 4, n, 8)).astype(np.float32))
        ya = blk_a._pool_tokens(x)
        yb = blk_b._pool_tokens(x)
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=1e-6, atol=1e-6
        )
