#!/usr/bin/env python3
"""ViTDet wall-clock timing (reference scripts/time/vitdet_vid.py):
per-frame pre_backbone / backbone / post_backbone segments, means with and
without the first (flush) frame. Synchronization via on-device scalar probes
(see utils/timing.py)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.data.vid import VID, VIDResize
from eventful_transformer_tpu.models.vitdet import ViTDet
from eventful_transformer_tpu.utils.config import initialize_run
from eventful_transformer_tpu.utils.evaluate import run_evaluations
from eventful_transformer_tpu.utils.misc import MeanValue
from eventful_transformer_tpu.utils.timing import scalar_probe


def evaluate_vitdet_runtime(model, params, data, config):
    c, in_h, in_w = model.input_shape
    backbone = MeanValue()
    backbone_non_first = MeanValue()
    other = MeanValue()
    other_non_first = MeanValue()

    @jax.jit
    def pre(p, frame, content_hw):
        tokens = model.pre_backbone(Ctx(), p, frame, content_hw)
        return tokens, scalar_probe(tokens)

    @jax.jit
    def mid(p, state, tokens):
        tokens, state = model.apply_backbone(Ctx(), p, state, tokens)
        return tokens, state, scalar_probe(tokens)

    @jax.jit
    def post(p, tokens):
        out = model.post_backbone(Ctx(), p, tokens)
        return scalar_probe(out)

    n_items = min(config.get("n_items") or len(data), len(data))
    for i in range(n_items):
        vid_item = data[i]
        state = model.init_state()
        for t in range(len(vid_item)):
            frame, _ = vid_item[t]
            frame = np.asarray(frame, np.float32)
            padded = np.zeros((1, c, in_h, in_w), np.float32)
            padded[0, :, : frame.shape[-2], : frame.shape[-1]] = frame
            content_hw = np.asarray(frame.shape[-2:], np.int32)
            t_0 = time.perf_counter()
            tokens, probe = pre(params, padded, content_hw)
            float(probe)
            t_1 = time.perf_counter()
            tokens, state, probe = mid(params, state, tokens)
            float(probe)
            t_2 = time.perf_counter()
            float(post(params, tokens))
            t_3 = time.perf_counter()
            t_backbone = t_2 - t_1
            t_other = (t_3 - t_2) + (t_1 - t_0)
            backbone.update(t_backbone)
            other.update(t_other)
            if t > 0:
                backbone_non_first.update(t_backbone)
                other_non_first.update(t_other)
    times = {
        "backbone": backbone.compute(),
        "backbone_non_first": backbone_non_first.compute(),
        "other": other.compute(),
        "other_non_first": other_non_first.compute(),
        "total": backbone.compute() + other.compute(),
        "total_non_first": backbone_non_first.compute() + other_non_first.compute(),
    }
    return {"times": times}


def main():
    config = initialize_run(config_location=Path("configs", "time", "vitdet_vid"))
    input_size = config.get("input_size", 1024)
    data = VID(
        Path("data", "vid"),
        split=config["split"],
        tar_path=Path("data", "vid", "data.tar"),
        combined_transform=VIDResize(
            short_edge_length=640 * input_size // 1024, max_size=input_size
        ),
    )
    run_evaluations(config, ViTDet, data, evaluate_vitdet_runtime)


if __name__ == "__main__":
    main()
