"""Multi-device tests on the 8-virtual-CPU mesh: TP-sharded forward
equivalence, the sharded training step, and the driver dry-run entry."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.parallel.mesh import best_dp_tp_mesh, make_mesh
from eventful_transformer_tpu.parallel.sharding import shard_params, vit_param_specs

TINY = dict(
    classes=16,
    input_shape=[8, 3, 32, 32],
    normalize_mean=0.45,
    normalize_std=0.225,
    spatial_views=1,
    temporal_stride=2,
    temporal_views=2,
    tubelet_shape=[2, 8, 8],
    spatial_config=dict(
        depth=2, position_encoding_size=[4, 4],
        block_config=dict(dim=32, heads=4, mlp_ratio=4),
    ),
    temporal_config=dict(
        depth=1, position_encoding_size=[4],
        block_config=dict(dim=32, heads=4, mlp_ratio=4),
    ),
)


@pytest.fixture(scope="module")
def devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


class TestMesh:
    def test_make_mesh_infers(self, devices):
        mesh = make_mesh((-1, 2))
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_best_dp_tp(self, devices):
        mesh = best_dp_tp_mesh(8, max_tp=4)
        assert dict(mesh.shape) == {"data": 2, "model": 4}
        mesh = best_dp_tp_mesh(8, max_tp=3)
        assert dict(mesh.shape) == {"data": 4, "model": 2}


class TestTensorParallel:
    def test_sharded_forward_matches_single_device(self, devices, rng):
        model = FactorizedViViT(**TINY)
        params = model.init(jax.random.PRNGKey(0))
        views = jnp.asarray(
            rng.standard_normal((4, 2, 8, 3, 32, 32)).astype(np.float32)
        )
        want = model.apply_views(Ctx(), params, views)

        mesh = make_mesh((2, 4), ("data", "model"))
        sharded = shard_params(mesh, params)
        views_sharded = jax.device_put(views, NamedSharding(mesh, P("data")))

        @jax.jit
        def fwd(p, v):
            return model.apply_views(Ctx(), p, v)

        got = fwd(sharded, views_sharded)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6
        )

    def test_param_specs_shard_the_right_axes(self):
        model = FactorizedViViT(**TINY)
        params = model.init(jax.random.PRNGKey(0))
        specs = vit_param_specs(params)
        block = specs["spatial_model"]["backbone"]["blocks"][0]
        assert block["qkv"]["kernel"] == P(None, "model")
        assert block["qkv"]["bias"] == P("model")
        assert block["projection"]["kernel"] == P("model", None)
        assert block["projection"]["bias"] == P()
        assert block["mlp_1"]["kernel"] == P(None, "model")
        assert block["mlp_2"]["kernel"] == P("model", None)
        assert specs["classifier"]["kernel"] == P()
        assert specs["embedding"]["kernel"] == P()


class TestDryrun:
    def test_graft_entry_dryrun(self, devices):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)

    def test_training_reduces_loss(self, devices):
        import optax

        from eventful_transformer_tpu.parallel.train import make_sharded_train_step

        model = FactorizedViViT(**TINY, dropout_rate=0.0)
        params = model.init(jax.random.PRNGKey(0))
        mesh = best_dp_tp_mesh(8, max_tp=2)
        optimizer = optax.adamw(3e-3)
        init_fn, make_jitted = make_sharded_train_step(model, optimizer, mesh)
        params, opt_state, shardings = init_fn(params)
        step = make_jitted(params, opt_state, shardings)
        rng = np.random.default_rng(0)
        batch = {
            "inputs": jnp.asarray(
                rng.standard_normal((8, 2, 8, 3, 32, 32)).astype(np.float32)
            ),
            "labels": jnp.asarray(rng.integers(0, 16, (8,), dtype=np.int32)),
        }
        losses = []
        for i in range(5):
            params, opt_state, loss = step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestDataParallelEval:
    def test_dp_eval_matches_single_stream(self, devices):
        from eventful_transformer_tpu.data import SyntheticVideoClassification
        from eventful_transformer_tpu.parallel.evaluate import evaluate_vivit_metrics_dp
        from eventful_transformer_tpu.utils.evaluate import evaluate_vivit_metrics

        model = FactorizedViViT(**TINY)
        params = model.init(jax.random.PRNGKey(0))
        data = SyntheticVideoClassification(n_items=6, n_frames=16, size=(32, 32), classes=16)
        config = {"n_items": 6}
        want = evaluate_vivit_metrics(model, params, data, config)
        mesh = make_mesh((8,), ("data",))
        got = evaluate_vivit_metrics_dp(model, params, data, config, mesh)
        assert got["metrics"] == want["metrics"]
        # Counts include padded duplicates in the final group; check keys only.
        assert set(got["counts"]) == set(want["counts"])


class TestUlyssesBackbone:
    """Sequence-parallel (Ulysses) attention wired into the backbone via the
    ``sequence_parallel`` block-config option: tokens stay sharded through
    every token-wise op; the two all-to-alls inside Block._attention_ulysses
    trade tokens for heads so attention is exact."""

    def test_sequence_parallel_matches_single_device(self, devices, rng):
        from jax.sharding import Mesh

        from eventful_transformer_tpu.core.backbones import ViTBackbone

        def build(sp):
            cfg = dict(dim=32, heads=4, mlp_ratio=2)
            if sp:
                cfg["sequence_parallel"] = "seq"
            return ViTBackbone(
                block_config=cfg, depth=2,
                position_encoding_size=[4, 8], input_size=(4, 8),
            )

        ref = build(False)
        spb = build(True)
        params = ref.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((2, 32, 32)).astype(np.float32))
        want, _ = ref.apply(Ctx(), params, ref.init_state(2), x)

        mesh = Mesh(np.array(devices[:4]), ("seq",))
        aux = spb.precompute(params)

        def local(p, a, xs):
            y, _ = spb.apply(Ctx(), p, spb.init_state(2), xs, aux=a)
            return y

        param_spec = jax.tree_util.tree_map(lambda _: P(), params)
        aux_spec = jax.tree_util.tree_map(lambda _: P(None, "seq", None), aux)
        shard = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(param_spec, aux_spec, P(None, "seq", None)),
                out_specs=P(None, "seq", None),
            )
        )
        got = shard(params, aux, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_incompatible_options_rejected(self):
        from eventful_transformer_tpu.core.blocks import Block

        with pytest.raises(AssertionError):
            Block(
                dim=32, heads=4, mlp_ratio=2, input_size=(4, 8),
                window_size=[2, 2], sequence_parallel="seq",
            )


class TestVitDetDataParallelEval:
    """DP ViTDet eval (one video per data shard, shard_map with local
    batch 1) matches the sequential eval driver on the same items:
    identical mAP metrics and per-frame counts."""

    def test_dp_matches_sequential(self, devices):
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
        from scripts.evaluate.vitdet_vid import evaluate_vitdet_metrics
        from tests.test_vitdet_eval_driver import TINY, _SyntheticVID

        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.models.vitdet import ViTDet
        from eventful_transformer_tpu.parallel.evaluate import (
            evaluate_vitdet_metrics_dp,
        )
        from eventful_transformer_tpu.utils.misc import set_policies

        rng = np.random.default_rng(7)
        data = _SyntheticVID(rng)
        model = ViTDet(**TINY)
        set_policies(model, TokenNormTopK, k=6)
        params = model.init(jax.random.PRNGKey(0))
        config = {"n_items": 2}

        seq = evaluate_vitdet_metrics(model, params, data, config)
        mesh = make_mesh((2,), ("data",), devices=devices[:2])
        dp = evaluate_vitdet_metrics_dp(model, params, data, config, mesh)

        for key, val in seq["metrics"].items():
            np.testing.assert_allclose(
                dp["metrics"][key], val, rtol=1e-4, atol=1e-5
            )
        for key, val in seq["counts"].items():
            np.testing.assert_allclose(dp["counts"][key], val, rtol=1e-4), key


class TestVitDetSequenceParallelEval:
    """Config-reachable Ulysses eval: dense global-attention ViTDet with
    the backbone token-sharded over a "seq" axis matches the sequential
    driver's mAP and FLOP counts exactly."""

    def test_sp_matches_sequential(self, devices):
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
        from scripts.evaluate.vitdet_vid import evaluate_vitdet_metrics
        from tests.test_vitdet_eval_driver import TINY, _SyntheticVID

        from eventful_transformer_tpu.models.vitdet import ViTDet
        from eventful_transformer_tpu.parallel.evaluate import (
            evaluate_vitdet_metrics_sp,
        )

        cfg = {k: v for k, v in TINY.items()}
        bb = dict(cfg["backbone_config"])
        bb["window_indices"] = []
        bb["block_class"] = "Block"
        bb.pop("windowed_class", None)
        blk = dict(bb["block_config"])
        blk["window_size"] = None
        bb["block_config"] = blk
        cfg["backbone_config"] = bb

        rng = np.random.default_rng(9)
        data = _SyntheticVID(rng)
        ref_model = ViTDet(**cfg)
        params = ref_model.init(jax.random.PRNGKey(1))
        config = {"n_items": 2}
        seq = evaluate_vitdet_metrics(ref_model, params, data, config)

        sp_cfg = {k: v for k, v in cfg.items()}
        sp_bb = dict(sp_cfg["backbone_config"])
        sp_blk = dict(sp_bb["block_config"])
        sp_blk["sequence_parallel"] = "seq"
        sp_bb["block_config"] = sp_blk
        sp_cfg["backbone_config"] = sp_bb
        sp_model = ViTDet(**sp_cfg)

        mesh = make_mesh((2,), ("seq",), devices=devices[:2])
        sp = evaluate_vitdet_metrics_sp(sp_model, params, data, config, mesh)

        for key, val in seq["metrics"].items():
            np.testing.assert_allclose(
                sp["metrics"][key], val, rtol=1e-4, atol=1e-5
            )
        for key, val in seq["counts"].items():
            np.testing.assert_allclose(sp["counts"][key], val, rtol=1e-4), key

    def test_ulysses_smoke_config_composes(self):
        from eventful_transformer_tpu.utils.config import load_config

        config = load_config(
            "configs/evaluate/vitdet_vid/ulysses_smoke_672.yml"
        )
        assert config["sequence_parallel"] == "seq"
        bc = config["model"]["backbone_config"]
        assert list(bc["window_indices"]) == []
        assert bc["block_config"]["sequence_parallel"] == "seq"
        assert bc["block_config"]["relative_embedding_size"] is None
