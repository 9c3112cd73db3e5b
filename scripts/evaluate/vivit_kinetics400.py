#!/usr/bin/env python3
"""Eventful-ViViT evaluation on Kinetics-400
(reference scripts/evaluate/vivit_kinetics400.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from eventful_transformer_tpu.data.kinetics400 import Kinetics400
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.utils.config import initialize_run
from eventful_transformer_tpu.utils.evaluate import evaluate_vivit_metrics, run_evaluations


def main():
    config = initialize_run(
        config_location=Path("configs", "evaluate", "vivit_kinetics400")
    )
    if config.get("synthetic"):
        # Dataset-free drive (temporally-redundant generated clips): the
        # full CLI -> config -> model -> sweep -> CSV pipeline without
        # Kinetics-400 on disk.
        from eventful_transformer_tpu.data.synthetic import (
            SyntheticVideoClassification,
        )

        data = SyntheticVideoClassification(**dict(config["synthetic"]))
    else:
        data = Kinetics400(
            Path("data", "kinetics400"), split="val", decode_size=224, decode_fps=25
        )
    evaluate_fn = evaluate_vivit_metrics
    if config.get("data_parallel"):
        # Shard videos over the "data" mesh axis (videos are independent:
        # state resets per video). `data_parallel=true` on any multi-device
        # host; weights replicate, metrics aggregate on host.
        from eventful_transformer_tpu.parallel.evaluate import (
            evaluate_vivit_metrics_dp,
        )
        from eventful_transformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((-1,), ("data",))
        evaluate_fn = lambda m, p, d, c: evaluate_vivit_metrics_dp(m, p, d, c, mesh)
    run_evaluations(config, FactorizedViViT, data, evaluate_fn)


if __name__ == "__main__":
    main()
