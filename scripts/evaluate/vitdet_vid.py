#!/usr/bin/env python3
"""Eventful-ViTDet evaluation on ImageNet VID
(reference scripts/evaluate/vitdet_vid.py): per-video state reset, COCO-style
mAP computed once over all predictions."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax

from eventful_transformer_tpu.core.counting import Counts, Ctx
from eventful_transformer_tpu.data.vid import VID, VIDResize
from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision
from eventful_transformer_tpu.models.vitdet import ViTDet
from eventful_transformer_tpu.utils.config import initialize_run
from eventful_transformer_tpu.utils.evaluate import run_evaluations


def evaluate_vitdet_metrics(model, params, data, config):
    mean_ap = MeanAveragePrecision()
    c, in_h, in_w = model.input_shape

    def build_step(_capacity=None):
        # Two compiled programs per budget: frame 0 of each video flushes
        # STATICALLY, the rest run incremental — no per-block
        # flush/incremental lax.cond in the hot loop (its state-buffer
        # layout copies cost ~30% of the eventful 672 backbone; see
        # ViTDet.apply).
        def make(mode):
            @jax.jit
            def jitted(p, state, frame, content_hw):
                ctx = Ctx(count_mode=True)
                out, state = model.apply(
                    ctx, p, state, frame, content_hw=content_hw, mode=mode
                )
                return out, state, ctx.counts

            return jitted

        flush, incremental = make("flush"), make("incremental")
        return lambda state, frame, hw, first: (
            flush if first else incremental
        )(params, state, frame, hw)

    # Capacity-bucketed dispatch for threshold policies (exact via
    # saturation-triggered escalation, utils/bucketing.py); other policies
    # use one fixed compiled step.
    from eventful_transformer_tpu.core.gating import TokenGate
    from eventful_transformer_tpu.core.policies import TokenNormThreshold
    from eventful_transformer_tpu.utils.bucketing import BucketedThresholdStep

    gates = model.modules_of_type(TokenGate)
    policy = gates[0].policy if gates else None
    buckets = config.get("bucket_capacities")
    if buckets and isinstance(policy, TokenNormThreshold):
        step = BucketedThresholdStep(model, build_step, policy.threshold, buckets)
    else:
        fixed = build_step()
        step = lambda state, frame, hw, first: fixed(state, frame, hw, first)
        step.reset = lambda: None

    total_counts = Counts()
    n_frames = 0
    n_items = min(config.get("n_items") or len(data), len(data))
    for i in range(n_items):
        vid_item = data[i]
        state = model.init_state()
        step.reset()
        for t in range(len(vid_item)):
            frame, annotations = vid_item[t]
            frame = np.asarray(frame, np.float32)
            # Fixed-shape host padding; the model re-zeroes the padded
            # region AFTER normalization (content_hw), matching the
            # reference's normalize-then-zero-pad order.
            padded = np.zeros((1, c, in_h, in_w), np.float32)
            padded[0, :, : frame.shape[-2], : frame.shape[-1]] = frame
            content_hw = np.asarray(frame.shape[-2:], np.int32)
            out, state, counts = step(state, padded, content_hw, t == 0)
            mask = np.asarray(out["mask"])
            mean_ap.update(
                [
                    {
                        "boxes": np.asarray(out["boxes"])[mask],
                        "scores": np.asarray(out["scores"])[mask],
                        "labels": np.asarray(out["labels"])[mask],
                    }
                ],
                [annotations],
            )
            total_counts = total_counts + Counts.from_device(counts)
            n_frames += 1
    metrics = mean_ap.compute()
    counts = (total_counts / max(n_frames, 1)).nonzero()
    return {"metrics": metrics, "counts": counts}


def main():
    config = initialize_run(config_location=Path("configs", "evaluate", "vitdet_vid"))
    long_edge = max(config["model"]["input_shape"][-2:])
    data = VID(
        Path("data", "vid"),
        split=config["split"],
        tar_path=Path("data", "vid", "data.tar"),
        combined_transform=VIDResize(
            short_edge_length=640 * long_edge // 1024, max_size=long_edge
        ),
    )
    evaluate_fn = evaluate_vitdet_metrics
    if config.get("sequence_parallel"):
        # Ulysses: backbone tokens sharded over a "seq" mesh axis (the
        # model config must set block_config.sequence_parallel to the same
        # axis name — see configs/evaluate/vitdet_vid/ulysses_smoke_672.yml).
        from eventful_transformer_tpu.parallel.evaluate import (
            evaluate_vitdet_metrics_sp,
        )
        from eventful_transformer_tpu.parallel.mesh import make_mesh

        axis = str(config["sequence_parallel"])
        sp_mesh = make_mesh((-1,), (axis,))
        evaluate_fn = lambda m, p, d, c: evaluate_vitdet_metrics_sp(
            m, p, d, c, sp_mesh, axis
        )
    elif config.get("data_parallel"):
        # One video per "data"-axis shard (videos are independent: state
        # resets per video); the whole per-frame pipeline runs unchanged
        # per shard, counts psum over the mesh, mAP aggregates on host.
        from eventful_transformer_tpu.parallel.evaluate import (
            evaluate_vitdet_metrics_dp,
        )
        from eventful_transformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((-1,), ("data",))
        evaluate_fn = lambda m, p, d, c: evaluate_vitdet_metrics_dp(m, p, d, c, mesh)
    run_evaluations(config, ViTDet, data, evaluate_fn)


if __name__ == "__main__":
    main()
