#!/usr/bin/env python3
"""Convert a detectron2 ViTDet checkpoint (.pkl or .pth) into our .npz
parameter format (reference scripts/convert/vitdet.py + layout transposes).

Weight sources:
https://github.com/facebookresearch/detectron2/tree/main/projects/ViTDet
https://github.com/happyharrycn/detectron2_vitdet_vid/tree/main/projects/ViTDet-VID
"""

import pickle
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from eventful_transformer_tpu.utils.misc import parse_patterns, remap_weights
from eventful_transformer_tpu.utils.params import convert_torch_state_dict


def main(args):
    if args.in_file.endswith(".pkl"):
        with open(args.in_file, "rb") as f:
            in_weights = pickle.load(f, encoding="latin1")
    else:
        import torch

        in_weights = torch.load(args.in_file, map_location="cpu", weights_only=False)
    if "model" in in_weights:
        in_weights = in_weights["model"]

    # Drop the class position-embedding token (reference
    # scripts/convert/vitdet.py:27-28).
    key = "backbone.net.pos_embed"
    if key in in_weights:
        in_weights[key] = np.asarray(in_weights[key])[:, 1:]

    patterns = parse_patterns(args.pattern_file)
    remapped, n_remapped = remap_weights(in_weights, patterns, args.verbose)
    flat = convert_torch_state_dict(remapped)
    np.savez(args.out_file, **flat)
    print(f"Remapped {n_remapped}/{len(in_weights)} weights -> {args.out_file}")


def parse_args():
    parser = ArgumentParser()
    parser.add_argument("in_file", help="the input .pkl or .pth checkpoint")
    parser.add_argument("out_file", help=".npz file where the output should be saved")
    parser.add_argument(
        "pattern_file",
        nargs="?",
        default="configs/convert/vitdet_b.txt",
        help=".txt file containing regex rename patterns",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
