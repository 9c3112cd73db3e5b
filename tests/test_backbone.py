"""Backbone-level tests: the homogeneous-stack lax.scan path must be
numerically identical to the unrolled path (params, state and counts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import eventful_transformer_tpu.core.backbones as backbones
from eventful_transformer_tpu.core.backbones import ViTBackbone
from eventful_transformer_tpu.core.counting import count_value, Ctx
from eventful_transformer_tpu.core.gating import TokenGate
from eventful_transformer_tpu.core.policies import TokenNormTopK

CONFIG = dict(
    depth=3,
    position_encoding_size=[4, 4],
    block_config=dict(dim=32, heads=4, mlp_ratio=2),
)


@pytest.fixture
def force_unrolled(monkeypatch):
    monkeypatch.setattr(
        backbones.ViTBackbone, "homogeneous", property(lambda self: False)
    )


def _run(backbone, params, x, frames=3, k=None):
    if k is not None:
        for gate in backbone.modules_of_type(TokenGate):
            gate.policy = TokenNormTopK(k)
    state = backbone.init_state(x.shape[0])
    ctx = Ctx(count_mode=True)
    outs = []
    for t in range(frames):
        y, state = backbone.apply(ctx, params, state, x + 0.1 * t)
        outs.append(np.asarray(y))
    return np.stack(outs), {k: count_value(v) for k, v in ctx.counts.items()}


class TestScannedBackbone:
    @pytest.mark.parametrize("block_class,k", [("Block", None), ("EventfulBlock", 6)])
    def test_scan_equals_unrolled(self, rng, monkeypatch, block_class, k):
        backbone = ViTBackbone(block_class=block_class, input_size=(4, 4), **CONFIG)
        assert backbone.homogeneous
        params = backbone.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
        scanned, counts_scan = _run(backbone, params, x, k=k)
        monkeypatch.setattr(
            backbones.ViTBackbone, "homogeneous", property(lambda self: False)
        )
        unrolled, counts_unroll = _run(backbone, params, x, k=k)
        np.testing.assert_allclose(scanned, unrolled, rtol=1e-5, atol=1e-6)
        for key in counts_scan:
            assert counts_scan[key] == pytest.approx(counts_unroll[key], rel=1e-6)

    def test_windowed_mix_is_not_homogeneous(self):
        backbone = ViTBackbone(
            input_size=(4, 4),
            depth=3,
            position_encoding_size=[4, 4],
            window_indices=[0, 1],
            block_config=dict(dim=32, heads=4, mlp_ratio=2, window_size=[2, 2]),
        )
        assert not backbone.homogeneous


class TestATS:
    """ATS shrinks the token count through the stack. The reference's
    head-score reduction (blocks.py:163, dim=-3) reduces its batch/view axis
    and only works when views == heads; we reduce over heads (the intended
    semantics) so no golden parity is possible — these are behavior tests."""

    def test_ats_vivit_dense_and_eventful(self, rng):
        from eventful_transformer_tpu.core.policies import TokenNormTopFraction
        from eventful_transformer_tpu.models import FactorizedViViT
        from eventful_transformer_tpu.utils.misc import set_policies

        cfg = dict(
            classes=10, input_shape=[8, 3, 32, 32], normalize_mean=0.45,
            normalize_std=0.225, spatial_views=1, temporal_stride=2,
            temporal_views=2, tubelet_shape=[2, 8, 8],
            spatial_config=dict(
                depth=2, position_encoding_size=[4, 4],
                block_config=dict(dim=32, heads=4, mlp_ratio=2, ats_fraction=0.9),
            ),
            temporal_config=dict(
                depth=1, position_encoding_size=[4],
                block_config=dict(dim=32, heads=4, mlp_ratio=2),
            ),
        )
        views = jnp.asarray(rng.standard_normal((1, 2, 8, 3, 32, 32)).astype(np.float32))
        model = FactorizedViViT(**cfg)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply_views(Ctx(), params, views)
        assert float(out.sum()) == pytest.approx(1.0, abs=1e-4)
        cfg_e = dict(cfg)
        cfg_e["spatial_config"] = dict(cfg["spatial_config"], block_class="EventfulBlock")
        model_e = FactorizedViViT(**cfg_e)
        set_policies(model_e, TokenNormTopFraction, fraction=0.5)
        out_e = jax.jit(lambda p, v: model_e.apply_views(Ctx(), p, v))(params, views)
        assert float(out_e.sum()) == pytest.approx(1.0, abs=1e-4)
        assert np.isfinite(np.asarray(out_e)).all()


class TestViViTForwardVariants:
    """The TPU-perf variants of the ViViT forward (strided-conv tubelet
    lowering; static flush/incremental split under full frame unroll) must
    match the baseline einsum / cond-dispatched paths exactly."""

    CFG = dict(
        classes=10, input_shape=[8, 3, 32, 32], normalize_mean=0.45,
        normalize_std=0.225, spatial_views=1, temporal_stride=2,
        temporal_views=2, tubelet_shape=[2, 8, 8],
        spatial_config=dict(
            depth=2, position_encoding_size=[4, 4],
            block_class="EventfulTokenwiseBlock",
            block_config=dict(dim=32, heads=4, mlp_ratio=2),
        ),
        temporal_config=dict(
            depth=1, position_encoding_size=[4],
            block_config=dict(dim=32, heads=4, mlp_ratio=2),
        ),
    )

    def _model(self, rng, **attrs):
        from eventful_transformer_tpu.models import FactorizedViViT
        from eventful_transformer_tpu.utils.misc import set_policies

        model = FactorizedViViT(**self.CFG)
        set_policies(model, TokenNormTopK, k=7)
        for name, val in attrs.items():
            setattr(model, name, val)
        params = model.init(jax.random.PRNGKey(0))
        views = jnp.asarray(
            rng.standard_normal((2, 2, 8, 3, 32, 32)).astype(np.float32)
        )
        return model, params, views

    def test_conv_embed_matches_einsum(self, rng):
        model, params, views = self._model(rng)
        model.embedding.conv_embed = False
        ya = model.apply_views(Ctx(), params, views)
        model.embedding.conv_embed = True
        yb = model.apply_views(Ctx(), params, views)
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-6
        )

    def test_split_flush_matches_cond(self, rng):
        model, params, views = self._model(rng, split_flush=False)
        ctx_a = Ctx(count_mode=True)
        ya = model.apply_views(ctx_a, params, views)
        model.split_flush = True
        model.frame_scan_unroll = 4
        ctx_b = Ctx(count_mode=True)
        yb = model.apply_views(ctx_b, params, views)
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-6
        )
        counts_a = {k: count_value(v) for k, v in ctx_a.counts.items()}
        counts_b = {k: count_value(v) for k, v in ctx_b.counts.items()}
        assert set(counts_a) == set(counts_b)
        for key in counts_a:
            np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6)

    def test_split_flush_auto_rule(self):
        from eventful_transformer_tpu.models import FactorizedViViT

        model = FactorizedViViT(**self.CFG)
        assert model._split_flush(3) is False  # unroll=1: cond dispatch
        model.frame_scan_unroll = 4
        assert model._split_flush(3) is True  # fully unrolled: split
        assert model._split_flush(5) is False  # partial unroll: cond
        model.frame_scan_unroll = True
        assert model._split_flush(99) is True
