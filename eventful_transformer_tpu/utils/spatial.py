"""Spatial-output caching for temporal fine-tuning
(reference utils/spatial.py:13-33): run the spatial sub-model (eventful,
TokenNormTopK at budget k) over a dataset and save per-clip .npz files."""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.core.policies import TokenNormTopK
from eventful_transformer_tpu.utils.misc import set_policies
from eventful_transformer_tpu.utils.params import load_params


def compute_vivit_spatial(config, output_dir, data, model_class=None):
    from eventful_transformer_tpu.models import FactorizedViViT

    model_class = model_class or FactorizedViViT
    model = model_class(**config["model"])
    assert model.spatial_only, "spatial caching requires model.spatial_only"
    template = model.init(jax.random.PRNGKey(0))
    weights = config.get("weights")
    params = load_params(weights, like=template) if weights else template

    set_policies(model, TokenNormTopK, k=config["k"])

    @jax.jit
    def _step(p, views):
        return model.apply_views(Ctx(), p, views)

    def step(views):
        return _step(params, views)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    try:
        from tqdm import tqdm

        indices = tqdm(range(len(data)), ncols=0)
    except ImportError:
        indices = range(len(data))
    for i in indices:
        video, label = data[i]
        views = model.preprocessing(np.asarray(video)[None])
        spatial = step(np.stack(views, axis=1))
        np.savez(
            output_dir / f"{i:05d}.npz",
            spatial=np.asarray(spatial),
            label=np.asarray(label),
        )
