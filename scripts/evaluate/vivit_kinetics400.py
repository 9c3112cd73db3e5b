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
    run_evaluations(config, FactorizedViViT, data, evaluate_vivit_metrics)


if __name__ == "__main__":
    main()
