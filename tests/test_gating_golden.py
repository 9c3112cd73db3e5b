"""Golden-parity tests: our functional gates/buffers/accumulators vs. the
reference PyTorch modules (imported read-only from /root/reference), driven
with identical random inputs over multiple time steps."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")

from eventful_transformer import modules as ref_modules  # noqa: E402
from eventful_transformer import policies as ref_policies  # noqa: E402

from eventful_transformer_tpu.core.counting import count_value, Counts, Ctx  # noqa: E402
from eventful_transformer_tpu.core.gating import (  # noqa: E402
    MatmulBuffer,
    MatmulDeltaAccumulator,
    SimpleSTGTGate,
    TokenBuffer,
    TokenDeltaGate,
    TokenGate,
)
from eventful_transformer_tpu.core.policies import (  # noqa: E402
    TokenNormThreshold,
    TokenNormTopFraction,
    TokenNormTopK,
)

B, N, C, K, T = 2, 16, 8, 5, 4


def _seq(rng, shape, t=T):
    return [rng.standard_normal((t,) + shape).astype(np.float32)[i] for i in range(t)]


def _ref_gate(cls, policy):
    g = cls()
    g.policy = policy
    return g


def _sorted_rows(x, idx):
    order = np.argsort(idx, axis=-1)
    return np.take_along_axis(x, order[..., None], axis=-2), np.take_along_axis(idx, order, -1)


class TestTokenGate:
    def test_matches_reference_topk(self, rng):
        ref = _ref_gate(ref_modules.TokenGate, ref_policies.TokenNormTopK(K))
        ours = TokenGate()
        ours.policy = TokenNormTopK(K)
        state = None
        for x in _seq(rng, (B, N, C)):
            rt = ref(torch.from_numpy(x.copy()))
            if state is None:
                y, state = ours.flush(None, jnp.asarray(x))
                assert rt[1] is None
                np.testing.assert_allclose(np.asarray(y), rt[0].numpy(), rtol=1e-6)
            else:
                ctx = Ctx(count_mode=True)
                y, idx, mask, state = ours.incremental(ctx, state, jnp.asarray(x))
                assert mask is None
                # Index sets must match; gathered rows compared in index order.
                ys, idxs = _sorted_rows(np.asarray(y), np.asarray(idx))
                rs, ridxs = _sorted_rows(rt[0].numpy(), rt[1].numpy())
                np.testing.assert_array_equal(idxs, ridxs)
                np.testing.assert_allclose(ys, rs, rtol=1e-5, atol=1e-6)
                assert count_value(ctx.counts["gate_flops"]) == B * N * C
        # Reference state p must agree at the end.
        np.testing.assert_allclose(
            np.asarray(state["p"]), ref.p.numpy(), rtol=1e-5, atol=1e-6
        )

    def test_matches_reference_threshold(self, rng):
        # Reference threshold policy asserts batch size 1.
        ref = _ref_gate(ref_modules.TokenGate, ref_policies.TokenNormThreshold(2.5))
        ours = TokenGate()
        ours.policy = TokenNormThreshold(2.5)
        state = None
        for x in _seq(rng, (1, N, C)):
            rt = ref(torch.from_numpy(x.copy()))
            if state is None:
                _, state = ours.flush(None, jnp.asarray(x))
            else:
                ctx = Ctx(count_mode=True)
                _, idx, mask, state = ours.incremental(ctx, state, jnp.asarray(x))
                got = set(np.asarray(idx)[0][np.asarray(mask)[0]].tolist())
                want = set(rt[1].numpy().ravel().tolist())
                assert got == want
        np.testing.assert_allclose(
            np.asarray(state["p"]), ref.p.numpy(), rtol=1e-5, atol=1e-6
        )

    def test_top_fraction_capacity(self):
        p = TokenNormTopFraction(0.5)
        assert p.capacity(16) == 8
        assert p.capacity(17) == 8


class TestTokenDeltaGate:
    def test_matches_reference(self, rng):
        ref = _ref_gate(ref_modules.TokenDeltaGate, ref_policies.TokenNormTopK(K))
        ours = TokenDeltaGate()
        ours.policy = TokenNormTopK(K)
        state = None
        for x in _seq(rng, (B, N, C)):
            rt = ref(torch.from_numpy(x.copy()))
            if state is None:
                _, state = ours.flush(None, jnp.asarray(x))
            else:
                ctx = Ctx(count_mode=True)
                c_t, e_t, idx, mask, state = ours.incremental(ctx, state, jnp.asarray(x))
                cs, idxs = _sorted_rows(np.asarray(c_t), np.asarray(idx))
                es, _ = _sorted_rows(np.asarray(e_t), np.asarray(idx))
                rcs, ridxs = _sorted_rows(rt[0].numpy(), rt[2].numpy())
                res, _ = _sorted_rows(rt[1].numpy(), rt[2].numpy())
                np.testing.assert_array_equal(idxs, ridxs)
                np.testing.assert_allclose(cs, rcs, rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(es, res, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state["p"]), ref.p.numpy(), rtol=1e-5, atol=1e-6
        )


class TestSTGTGate:
    def test_reference_state_is_full_input(self, rng):
        ref = _ref_gate(ref_modules.SimpleSTGTGate, ref_policies.TokenNormTopK(K))
        ours = SimpleSTGTGate()
        ours.policy = TokenNormTopK(K)
        state = None
        for x in _seq(rng, (B, N, C)):
            ref(torch.from_numpy(x.copy()))
            if state is None:
                _, state = ours.flush(None, jnp.asarray(x))
            else:
                _, idx, mask, state = ours.incremental(Ctx(), state, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(state["p"]), ref.p.numpy(), rtol=1e-6)


class TestTokenBuffer:
    @pytest.mark.parametrize("structure", ["row", "col"])
    def test_matches_reference(self, rng, structure):
        ref = ref_modules.TokenBuffer(structure=structure)
        ours = TokenBuffer(structure=structure)
        state = None
        shape = (B, N, C) if structure == "row" else (B, C, N)
        k_shape = (B, K, C) if structure == "row" else (B, C, K)
        for x in _seq(rng, shape):
            if state is None:
                out, state = ours.flush(None, jnp.asarray(x))
                rout = ref(torch.from_numpy(x.copy()), None)
            else:
                vals = rng.standard_normal(k_shape).astype(np.float32)
                idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(
                    np.int32
                )
                out, state = ours.incremental(state, jnp.asarray(vals), jnp.asarray(idx))
                rout = ref(torch.from_numpy(vals.copy()), torch.from_numpy(idx).long())
            np.testing.assert_allclose(np.asarray(out), rout.numpy(), rtol=1e-6)

    def test_masked_scatter_is_noop(self, rng):
        ours = TokenBuffer()
        x0 = rng.standard_normal((B, N, C)).astype(np.float32)
        _, state = ours.flush(None, jnp.asarray(x0))
        vals = rng.standard_normal((B, K, C)).astype(np.float32)
        idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(np.int32)
        mask = np.zeros((B, K), bool)
        mask[:, 0] = True
        out, _ = ours.incremental(state, jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(mask))
        expect = x0.copy()
        for b in range(B):
            expect[b, idx[b, 0]] = vals[b, 0]
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


class TestMatmulBuffer:
    def test_matches_reference(self, rng):
        H, D = 3, 4
        ref = ref_modules.MatmulBuffer()
        ours = MatmulBuffer()
        state = None
        counts = Counts()
        for t in range(T):
            q = rng.standard_normal((B, H, N, D)).astype(np.float32)
            k = rng.standard_normal((B, H, D, N)).astype(np.float32)
            ctx = Ctx(count_mode=True)
            if state is None:
                out, state = ours.flush(ctx, None, jnp.asarray(q), jnp.asarray(k))
                rout = ref(torch.from_numpy(q.copy()), torch.from_numpy(k.copy()), None, None)
            else:
                idx_q = np.stack(
                    [rng.choice(N, K, replace=False) for _ in range(B)]
                ).astype(np.int32)
                idx_k = np.stack(
                    [rng.choice(N, K - 1, replace=False) for _ in range(B)]
                ).astype(np.int32)
                out, state = ours.incremental(
                    ctx, state, jnp.asarray(q), jnp.asarray(k),
                    jnp.asarray(idx_q), jnp.asarray(idx_k),
                )
                ref.counting()
                rout = ref(
                    torch.from_numpy(q.copy()), torch.from_numpy(k.copy()),
                    torch.from_numpy(idx_q).long(), torch.from_numpy(idx_k).long(),
                )
                counts = counts + Counts.from_device(ctx.counts)
            np.testing.assert_allclose(np.asarray(out), rout.numpy(), rtol=1e-4, atol=1e-5)
        assert counts["matmul_flops"] == float(ref.total_counts()["matmul_flops"])


class TestMatmulDeltaAccumulator:
    def test_matches_reference(self, rng):
        H, D = 3, 4
        ref = ref_modules.MatmulDeltaAccumulator()
        ours = MatmulDeltaAccumulator()
        state = None
        counts = Counts()
        for t in range(T):
            ctx = Ctx(count_mode=True)
            if state is None:
                a = rng.standard_normal((B, H, N, N)).astype(np.float32)
                v = rng.standard_normal((B, H, N, D)).astype(np.float32)
                out, state = ours.flush(ctx, None, jnp.asarray(a), jnp.asarray(v))
                rout = ref(torch.from_numpy(a), torch.from_numpy(v), None, None)
            else:
                a_n = rng.standard_normal((B, H, N, K)).astype(np.float32)
                v_n = rng.standard_normal((B, H, K, D)).astype(np.float32)
                a_d = rng.standard_normal((B, H, N, K)).astype(np.float32)
                v_d = rng.standard_normal((B, H, K, D)).astype(np.float32)
                out, state = ours.incremental(
                    ctx, state, *(jnp.asarray(x) for x in (a_n, v_n, a_d, v_d))
                )
                ref.counting()
                rout = ref(*(torch.from_numpy(x.copy()) for x in (a_n, v_n, a_d, v_d)))
                counts = counts + Counts.from_device(ctx.counts)
            np.testing.assert_allclose(np.asarray(out), rout.numpy(), rtol=1e-4, atol=1e-5)
        rc = ref.total_counts()
        assert counts["accumulator_flops"] == float(rc["accumulator_flops"])
        assert counts["matmul_flops"] == float(rc["matmul_flops"])
