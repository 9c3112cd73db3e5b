#!/usr/bin/env python3
"""Measure the average non-padding content fraction of VID frames at the
672/1024 operating points (reference scripts/misc/measure_vitdet_padding.py)
— used to normalize FLOP counts fairly."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from eventful_transformer_tpu.data.vid import VID, VIDResize


def main():
    for size in 672, 1024:
        data = VID(
            Path("data", "vid"),
            split="vid_val",
            tar_path=Path("data", "vid", "data.tar"),
            combined_transform=VIDResize(
                short_edge_length=640 * size // 1024, max_size=size
            ),
        )
        weighted_sum = 0.0
        total_frames = 0
        for i in range(len(data)):
            vid_item = data[i]
            frame = vid_item[0][0]
            padding_ratio = frame.shape[-1] * frame.shape[-2] / (size**2)
            weighted_sum += len(vid_item) * padding_ratio
            total_frames += len(vid_item)
        print(f"Size {size}: {weighted_sum / total_frames:.5g}")


if __name__ == "__main__":
    main()
