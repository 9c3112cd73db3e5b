"""Temporal fine-tuning + spatial caching: the reference's full training
stack (SURVEY.md §3.3), end-to-end on synthetic data."""

import numpy as np

from eventful_transformer_tpu.data import SyntheticVideoClassification
from eventful_transformer_tpu.data.vivit_spatial import ViViTSpatial
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.utils.spatial import compute_vivit_spatial
from eventful_transformer_tpu.utils.train import train_vivit_temporal

MODEL = dict(
    classes=4,
    input_shape=[8, 3, 32, 32],
    normalize_mean=0.45,
    normalize_std=0.225,
    spatial_views=1,
    temporal_stride=2,
    temporal_views=2,
    tubelet_shape=[2, 8, 8],
    spatial_config=dict(
        depth=1,
        position_encoding_size=[4, 4],
        block_class="EventfulBlock",
        block_config=dict(dim=32, heads=4, mlp_ratio=2),
    ),
    temporal_config=dict(
        depth=1,
        position_encoding_size=[4],
        block_config=dict(dim=32, heads=4, mlp_ratio=2),
    ),
)


def test_spatial_cache_then_temporal_finetune(tmp_path):
    # Stage 1: cache eventful spatial outputs (utils/spatial.py path).
    data = SyntheticVideoClassification(n_items=6, n_frames=16, size=(32, 32), classes=4)
    spatial_config = {"model": dict(MODEL, spatial_only=True), "k": 8}
    compute_vivit_spatial(spatial_config, tmp_path / "cache", data)
    files = sorted((tmp_path / "cache").glob("*.npz"))
    assert len(files) == 6
    with np.load(files[0]) as f:
        assert f["spatial"].shape == (2, 4, 32)  # (views, t_tokens, dim)

    # Stage 2: fine-tune the temporal sub-model on the cache (utils/train.py).
    cached = ViViTSpatial(tmp_path / "cache")
    train_config = {
        "model": dict(MODEL, temporal_only=True, dropout_rate=0.5),
        "epochs": 2,
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 3e-3, "weight_decay": 0.05},
        "train_batch_size": 2,
        "val_batch_size": 2,
        "output_weights": str(tmp_path / "final.npz"),
    }
    params, history = train_vivit_temporal(train_config, cached, cached)
    assert (tmp_path / "final.npz").is_file()
    train_entries = [h for h in history if h["pass"] == "train"]
    assert train_entries[-1]["loss"] <= train_entries[0]["loss"] + 1e-3


def test_frozen_subtrees_stay_fixed(tmp_path):
    data = SyntheticVideoClassification(n_items=4, n_frames=16, size=(32, 32), classes=4)
    spatial_config = {"model": dict(MODEL, spatial_only=True), "k": 8}
    compute_vivit_spatial(spatial_config, tmp_path / "cache", data)
    cached = ViViTSpatial(tmp_path / "cache")
    config = {
        "model": dict(MODEL, temporal_only=True),
        "epochs": 1,
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-2},
        "train_batch_size": 2,
        "val_batch_size": 2,
    }
    import jax

    model = FactorizedViViT(**config["model"])
    init = model.init(jax.random.PRNGKey(42))
    params, _ = train_vivit_temporal(config, cached, cached)
    # Spatial model and embedding are frozen; temporal model must change.
    for sub in ("spatial_model", "embedding"):
        a = jax.tree_util.tree_leaves(init[sub])
        b = jax.tree_util.tree_leaves(params[sub])
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), sub
    changed = [
        not np.array_equal(x, y)
        for x, y in zip(
            jax.tree_util.tree_leaves(init["temporal_model"]),
            jax.tree_util.tree_leaves(params["temporal_model"]),
        )
    ]
    assert any(changed)
