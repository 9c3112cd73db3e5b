"""Config system, parameter checkpointing, conversion and the evaluation
driver (end-to-end on a tiny model + synthetic data)."""

import numpy as np
import pytest

import jax

from eventful_transformer_tpu.core.counting import Counts
from eventful_transformer_tpu.data import SyntheticVideoClassification
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.utils.config import (
    get_cli_config,
    load_config,
    parse_dotlist,
)
from eventful_transformer_tpu.utils.evaluate import evaluate_vivit_metrics, run_evaluations
from eventful_transformer_tpu.utils.misc import TopKAccuracy, parse_patterns, remap_weights
from eventful_transformer_tpu.utils.params import (
    convert_torch_state_dict,
    fill_like,
    load_params,
    save_params,
)

TINY_MODEL = dict(
    classes=10,
    input_shape=[8, 3, 32, 32],
    normalize_mean=0.45,
    normalize_std=0.225,
    spatial_views=2,
    temporal_stride=2,
    temporal_views=2,
    tubelet_shape=[2, 8, 8],
    spatial_config=dict(
        depth=2,
        position_encoding_size=[4, 4],
        block_config=dict(dim=32, heads=4, mlp_ratio=2),
    ),
    temporal_config=dict(
        depth=1,
        position_encoding_size=[4],
        block_config=dict(dim=32, heads=4, mlp_ratio=2),
    ),
)


class TestConfig:
    def test_defaults_composition(self, tmp_path):
        (tmp_path / "base.yml").write_text("a: 1\nb: {c: 2, d: 3}\n")
        (tmp_path / "mid.yml").write_text("_defaults: [base.yml]\nb: {c: 9}\ne: 4\n")
        (tmp_path / "top.yml").write_text("_defaults: [mid.yml]\na: 7\n")
        config = load_config(tmp_path / "top.yml")
        assert config == {"a": 7, "b": {"c": 9, "d": 3}, "e": 4}

    def test_reference_config_compose(self):
        """Our loader must compose the reference's actual config tree."""
        config = load_config(
            "/root/reference/configs/evaluate/vivit_kinetics400/temporal_24.yml",
            root="/root/reference",
        )
        assert config["token_top_k"] == [24]
        assert config["model"]["spatial_config"]["block_class"] == "EventfulBlock"
        assert config["model"]["spatial_config"]["block_config"]["dim"] == 768
        assert config["model"]["classes"] == 400

    def test_dotlist_and_interpolation(self, tmp_path):
        (tmp_path / "c.yml").write_text("_output: 'results/${_name}/'\nx: {y: 1}\n")
        config = get_cli_config(str(tmp_path), argv=["c", "x.y=5", "x.z=[1,2]"])
        assert config["x"] == {"y": 5, "z": [1, 2]}
        assert config["_name"] == "c-x.y=5-x.z=[1,2]"
        assert config["_output"] == "results/c-x.y=5-x.z=[1,2]/"

    def test_dotlist_parse_types(self):
        out = parse_dotlist(["a.b=1.5", "a.c=true", "d=hello"])
        assert out == {"a": {"b": 1.5, "c": True}, "d": "hello"}


class TestParams:
    def test_roundtrip(self, tmp_path):
        model = FactorizedViViT(**TINY_MODEL)
        params = model.init(jax.random.PRNGKey(0))
        save_params(tmp_path / "p.npz", params)
        loaded = load_params(tmp_path / "p.npz", like=params)
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(loaded)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_conversion_applies(self):
        torch = pytest.importorskip("torch")
        model = FactorizedViViT(**TINY_MODEL)
        params = model.init(jax.random.PRNGKey(0))
        # Build a reference-layout state dict by inverting our template.
        sd = {}
        sd["embedding.conv.weight"] = torch.randn(32, 3, 2, 8, 8)
        sd["embedding.conv.bias"] = torch.randn(32)
        sd["classifier.weight"] = torch.randn(10, 32)
        sd["classifier.bias"] = torch.randn(10)
        sd["spatial_model.class_token"] = torch.randn(1, 1, 32)
        sd["temporal_model.class_token"] = torch.randn(1, 1, 32)
        for sub, depth in (("spatial_model", 2), ("temporal_model", 1)):
            sd[f"{sub}.layer_norm.weight"] = torch.randn(32)
            sd[f"{sub}.layer_norm.bias"] = torch.randn(32)
            sd[f"{sub}.backbone.position_encoding.encoding"] = torch.randn(
                1, 17 if sub == "spatial_model" else 5, 32
            )
            for i in range(depth):
                p = f"{sub}.backbone.blocks.{i}"
                for ln in ("input_layer_norm", "mlp_layer_norm"):
                    sd[f"{p}.{ln}.weight"] = torch.randn(32)
                    sd[f"{p}.{ln}.bias"] = torch.randn(32)
                for lin, o, i_ in (
                    ("qkv", 96, 32),
                    ("projection", 32, 32),
                    ("mlp_1", 64, 32),
                    ("mlp_2", 32, 64),
                ):
                    sd[f"{p}.{lin}.weight"] = torch.randn(o, i_)
                    sd[f"{p}.{lin}.bias"] = torch.randn(o)
        flat = convert_torch_state_dict(sd)
        converted = fill_like(params, flat)
        # Spot-check the transposes.
        np.testing.assert_allclose(
            np.asarray(converted["classifier"]["kernel"]),
            sd["classifier.weight"].numpy().T,
        )
        w = sd["embedding.conv.weight"].numpy()
        np.testing.assert_allclose(
            np.asarray(converted["embedding"]["kernel"]),
            w.transpose(1, 2, 3, 4, 0).reshape(-1, 32),
        )

    def test_pattern_remap(self, tmp_path):
        (tmp_path / "pat.txt").write_text(
            "backbone\\.layers\\.(\\d+)\\.attn\n"
            "backbone.blocks.\\1.qkv\n"
            "\n"
            "head\\..*\n"
            "DISCARD\n"
        )
        patterns = parse_patterns(tmp_path / "pat.txt")
        weights = {"backbone.layers.3.attn.weight": 1, "head.fc.weight": 2, "other": 3}
        out, n = remap_weights(weights, patterns)
        assert out == {"backbone.blocks.3.qkv.weight": 1, "other": 3}
        assert n == 2


class TestEvaluation:
    def test_run_evaluations_end_to_end(self, tmp_path):
        data = SyntheticVideoClassification(n_items=2, n_frames=20, size=(40, 48))
        # Dense model: vanilla entry (as in the reference's base.yml configs).
        dense_config = {
            "model": dict(TINY_MODEL),
            "_output": str(tmp_path / "dense"),
            "vanilla": True,
            "n_items": 2,
        }
        completed = run_evaluations(
            dense_config, FactorizedViViT, data, evaluate_vivit_metrics
        )
        assert completed == ["Vanilla"]
        # Eventful model: policy sweeps (as in temporal_*.yml configs).
        config = {
            "model": dict(
                TINY_MODEL,
                spatial_config=dict(
                    TINY_MODEL["spatial_config"], block_class="EventfulBlock"
                ),
            ),
            "_output": str(tmp_path / "out"),
            "token_top_k": [6],
            "token_top_fraction": [0.5],
            "token_thresholds": [1.0],
            "n_items": 2,
        }
        completed = run_evaluations(
            config, FactorizedViViT, data, evaluate_vivit_metrics
        )
        assert completed == [
            "Token top k=6",
            "Token top 50.0%",
            "Token threshold 1.0",
        ]
        out = tmp_path / "out"
        assert (out / "output.txt").is_file()
        metrics_csv = (out / "metrics.csv").read_text().strip().splitlines()
        assert metrics_csv[0] == "top_1,top_5"
        assert len(metrics_csv) == 4  # header + 3 runs
        counts_csv = (out / "counts.csv").read_text().strip().splitlines()
        assert "linear_flops" in counts_csv[0]

    def test_topk_accuracy(self):
        acc = TopKAccuracy(k=2)
        pred = np.array([[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]])
        acc.update(pred, np.array([2, 1]))
        assert acc.compute() == 0.5

    def test_counts_arithmetic(self):
        c = Counts({"a": 2.0, "b": 4.0})
        assert (c + c)["a"] == 4.0
        assert (c / 2)["b"] == 2.0
        assert c.csv_header() == "a,b"
        assert (c - Counts({"a": 1.0}))["a"] == 1.0


class TestBucketedViViTEval:
    def test_threshold_bucketing_exact_through_run_evaluations(self, tmp_path):
        """`bucket_capacities` routes the ViViT threshold sweep through the
        capacity-bucketed dispatcher (escalating per-video re-runs, exact by
        construction): metrics match the unbucketed full-capacity run."""
        data = SyntheticVideoClassification(n_items=2, n_frames=20, size=(40, 48))
        base = {
            "model": dict(
                TINY_MODEL,
                spatial_config=dict(
                    TINY_MODEL["spatial_config"], block_class="EventfulBlock"
                ),
            ),
            "token_thresholds": [1.0],
            "n_items": 2,
        }
        full = dict(base, _output=str(tmp_path / "full"))
        run_evaluations(full, FactorizedViViT, data, evaluate_vivit_metrics)
        bucketed = dict(
            base,
            _output=str(tmp_path / "bucketed"),
            bucket_capacities=[4, 8, 17],  # 17 = n_tokens (4x4 grid + class)
        )
        run_evaluations(bucketed, FactorizedViViT, data, evaluate_vivit_metrics)
        for name in ("metrics.csv", "counts.csv"):
            a = (tmp_path / "full" / name).read_text()
            b = (tmp_path / "bucketed" / name).read_text()
            assert a == b, name
