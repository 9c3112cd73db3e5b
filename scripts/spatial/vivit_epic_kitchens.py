#!/usr/bin/env python3
"""Cache eventful spatial-sub-model outputs for EPIC-Kitchens
(reference scripts/spatial/vivit_epic_kitchens.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from eventful_transformer_tpu.data.epic_kitchens import EPICKitchens
from eventful_transformer_tpu.utils.config import get_cli_config
from eventful_transformer_tpu.utils.spatial import compute_vivit_spatial


def main():
    config = get_cli_config(config_location=Path("configs", "spatial", "vivit_epic_kitchens"))
    k = config["k"]
    location = Path("data", "epic_kitchens")
    for split in "train", "validation":
        print(f"{split.capitalize()}, k={k}", flush=True)
        data = EPICKitchens(location, split=split, shuffle=False)
        compute_vivit_spatial(config, location / split / f"spatial_{k}", data)


if __name__ == "__main__":
    main()
