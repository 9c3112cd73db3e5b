"""Temporal fine-tuning + spatial caching: the reference's full training
stack (SURVEY.md §3.3), end-to-end on synthetic data."""

import numpy as np

import jax
import jax.numpy as jnp

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


class TestCheckpointResume:
    def test_full_state_roundtrip(self, tmp_path, rng):
        """Orbax train-state checkpoint: params + optimizer moments + epoch
        restore exactly."""
        import optax

        from eventful_transformer_tpu.utils.checkpoint import (
            latest_epoch,
            restore_train_state,
            save_train_state,
        )

        params = {
            "w": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
            "b": jnp.asarray(rng.standard_normal(3).astype(np.float32)),
        }
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        # advance one step so the moments are nontrivial
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        save_train_state(tmp_path, 3, params, opt_state)
        assert latest_epoch(tmp_path) == 3
        like_p = jax.tree_util.tree_map(jnp.zeros_like, params)
        like_o = jax.tree_util.tree_map(jnp.zeros_like, opt_state)
        got_p, got_o = restore_train_state(tmp_path, 3, like_p, like_o)
        for a, b in zip(jax.tree_util.tree_leaves(got_p), jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(got_o), jax.tree_util.tree_leaves(opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trainer_resumes(self, tmp_path, rng):
        """A 1-epoch run checkpointed, then resumed for a 2nd epoch: the
        resumed trainer skips epoch 1 and continues exactly."""
        from eventful_transformer_tpu.data.synthetic import SyntheticVideoClassification
        from eventful_transformer_tpu.utils.train import train_vivit_temporal

        class CachedSpatial:
            """Tiny stand-in for ViViTSpatial: (spatial, label) items."""

            def __init__(self, n=4):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                g = np.random.default_rng(i)
                return (
                    g.standard_normal((2, 4, 16)).astype(np.float32),  # (V, T', C)
                    int(g.integers(5)),
                )

        config = dict(
            model=dict(
                classes=5,
                input_shape=[8, 3, 16, 16],
                normalize_mean=0.45,
                normalize_std=0.225,
                spatial_views=1,
                temporal_stride=2,
                temporal_views=2,
                tubelet_shape=[2, 8, 8],
                temporal_only=True,
                dropout_rate=0.0,
                spatial_config=dict(
                    depth=1, position_encoding_size=[2, 2],
                    block_config=dict(dim=16, heads=2, mlp_ratio=2),
                ),
                temporal_config=dict(
                    depth=1, position_encoding_size=[4],
                    block_config=dict(dim=16, heads=2, mlp_ratio=2),
                ),
            ),
            learning_rate=1e-3,
            weight_decay=0.01,
            epochs=1,
            train_batch_size=2,
            val_batch_size=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        data = CachedSpatial()
        params_1, _ = train_vivit_temporal(config, data, data)
        from eventful_transformer_tpu.utils.checkpoint import latest_epoch

        assert latest_epoch(config["checkpoint_dir"]) == 1
        # resume with a higher epoch target: must pick up from epoch 1
        config2 = dict(config, epochs=2)
        params_2, history = train_vivit_temporal(config2, data, data)
        assert latest_epoch(config["checkpoint_dir"]) == 2
        # the resumed run logged epochs starting at 1 (skip epoch-1 training)
        train_steps = [h["step"] for h in history if h["pass"] == "train"]
        assert train_steps == [2]
