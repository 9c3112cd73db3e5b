#!/usr/bin/env python3
"""Convert a TAdaConv ViViT checkpoint (.pyth) into our .npz parameter
format (reference scripts/convert/vivit.py + utils/misc.py:97-131, extended
with the torch->JAX layout transposes).

Weight source: https://github.com/alibaba-mmai-research/TAdaConv
"""

import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from eventful_transformer_tpu.utils.misc import parse_patterns, remap_weights
from eventful_transformer_tpu.utils.params import convert_torch_state_dict


def main(args):
    import torch

    in_weights = torch.load(args.in_file, map_location="cpu", weights_only=False)
    if "model_state" in in_weights:
        in_weights = in_weights["model_state"]
    patterns = parse_patterns(args.pattern_file)
    remapped, n_remapped = remap_weights(in_weights, patterns, args.verbose)
    flat = convert_torch_state_dict(remapped)
    np.savez(args.out_file, **flat)
    print(f"Remapped {n_remapped}/{len(in_weights)} weights -> {args.out_file}")


def parse_args():
    parser = ArgumentParser()
    parser.add_argument("in_file", help="the input .pyth/.pth checkpoint")
    parser.add_argument("out_file", help=".npz file where the output should be saved")
    parser.add_argument(
        "pattern_file",
        nargs="?",
        default="configs/convert/vivit_b.txt",
        help=".txt file containing regex rename patterns",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
