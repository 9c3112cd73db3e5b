#!/usr/bin/env python3
"""ViViT wall-clock timing: spatial vs temporal sub-model seconds per clip
(reference scripts/time/vivit_epic_kitchens.py:17-45). TPU timing uses
``jax.block_until_ready`` where the reference uses cuda.synchronize."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.data.epic_kitchens import EPICKitchens
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.utils.config import initialize_run
from eventful_transformer_tpu.utils.evaluate import run_evaluations
from eventful_transformer_tpu.utils.misc import MeanValue


def evaluate_vivit_runtime(model, params, data, config):
    from eventful_transformer_tpu.utils.timing import scalar_probe

    spatial_time = MeanValue()
    temporal_time = MeanValue()

    @jax.jit
    def spatial_step(p, views):
        model.spatial_only, model.temporal_only = True, False
        try:
            x = model.apply_views(Ctx(), p, views)
        finally:
            model.spatial_only = False
        return x, scalar_probe(x)

    @jax.jit
    def temporal_step(p, x):
        return scalar_probe(model._forward_temporal(Ctx(), p, x, x.shape[0]))

    n_items = min(config.get("n_items") or len(data), len(data))
    for i in range(n_items):
        video, _ = data[i]
        views = np.stack(model.preprocessing(np.asarray(video)[None]), axis=1)
        # Warm start per shape; synchronization = scalar readback (see
        # utils/timing.py — block_until_ready is unreliable on this platform).
        x, probe = spatial_step(params, views)
        float(probe), float(temporal_step(params, x))
        t_0 = time.perf_counter()
        x, probe = spatial_step(params, views)
        float(probe)
        t_1 = time.perf_counter()
        float(temporal_step(params, x))
        t_2 = time.perf_counter()
        spatial_time.update(t_1 - t_0)
        temporal_time.update(t_2 - t_1)
    times = {
        "spatial": spatial_time.compute(),
        "temporal": temporal_time.compute(),
        "total": spatial_time.compute() + temporal_time.compute(),
    }
    return {"times": times}


def main():
    config = initialize_run(config_location=Path("configs", "time", "vivit_epic_kitchens"))
    data = EPICKitchens(Path("data", "epic_kitchens"), split="validation")
    run_evaluations(config, FactorizedViViT, data, evaluate_vivit_runtime)


if __name__ == "__main__":
    main()
