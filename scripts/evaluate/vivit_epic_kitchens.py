#!/usr/bin/env python3
"""Eventful-ViViT evaluation on EPIC-Kitchens-100
(reference scripts/evaluate/vivit_epic_kitchens.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from eventful_transformer_tpu.data.epic_kitchens import EPICKitchens
from eventful_transformer_tpu.models import FactorizedViViT
from eventful_transformer_tpu.utils.config import initialize_run
from eventful_transformer_tpu.utils.evaluate import evaluate_vivit_metrics, run_evaluations


def main():
    config = initialize_run(
        config_location=Path("configs", "evaluate", "vivit_epic_kitchens")
    )
    data = EPICKitchens(Path("data", "epic_kitchens"), split="validation")
    run_evaluations(config, FactorizedViViT, data, evaluate_vivit_metrics)


if __name__ == "__main__":
    main()
