"""Metrics, policy injection and small utilities
(reference utils/misc.py)."""

from __future__ import annotations

import re
import subprocess
from pathlib import Path
from random import Random

import numpy as np

from eventful_transformer_tpu.core.gating import TokenGate


class MeanValue:
    """Running mean (reference utils/misc.py:12-26)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def compute(self):
        return 0.0 if (self.count == 0) else self.sum / self.count

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value):
        self.sum += value
        self.count += 1


class TopKAccuracy:
    """Top-k classification accuracy (reference utils/misc.py:29-45)."""

    def __init__(self, k):
        self.k = k
        self.correct = 0
        self.total = 0

    def compute(self):
        return self.correct / self.total

    def reset(self):
        self.correct = 0
        self.total = 0

    def update(self, pred, true):
        pred = np.asarray(pred)
        true = np.asarray(true).reshape(-1)
        top_k = np.argsort(pred, axis=-1)[..., -self.k:]
        self.correct += int((top_k == true[:, None]).sum())
        self.total += true.size


def set_policies(model, policy_class, **policy_kwargs):
    """Inject a fresh policy into every gate of the model
    (reference utils/misc.py:140-143).

    NOTE (JAX): policies carry static capacity; after changing policies any
    jitted function closing over the model must be rebuilt — jit caches key
    on arguments, not closures. The evaluation driver constructs its jitted
    step per sweep entry for exactly this reason.
    """
    # TokenGate is the base of TokenDeltaGate and SimpleSTGTGate.
    for gate in model.modules_of_type(TokenGate):
        gate.policy = policy_class(**policy_kwargs)


def seeded_shuffle(sequence, seed):
    rng = Random()
    rng.seed(seed)
    rng.shuffle(sequence)


def tee_print(s, file, flush=True):
    print(s, flush=flush)
    print(s, file=file, flush=flush)


def decode_video(
    input_path,
    output_path,
    name_format="%d",
    image_format="png",
    ffmpeg_input_args=None,
    ffmpeg_output_args=None,
):
    """ffmpeg video decode to image frames (reference utils/misc.py:48-68)."""
    output_path = Path(output_path)
    output_path.mkdir(exist_ok=True)
    ffmpeg_input_args = ffmpeg_input_args or []
    ffmpeg_output_args = ffmpeg_output_args or []
    return subprocess.call(
        ["ffmpeg", "-loglevel", "error"]
        + ffmpeg_input_args
        + ["-i", str(input_path)]
        + ffmpeg_output_args
        + [str(output_path / f"{name_format}.{image_format}")]
    )


def download_file(url, output_path, chunk_size=4096, verbose=True):
    import requests

    if verbose:
        print(f"Downloading {url}...", flush=True)
    with requests.get(url, stream=True) as source:
        with open(output_path, "wb") as output_file:
            for chunk in source.iter_content(chunk_size=chunk_size):
                if chunk:
                    output_file.write(chunk)


def parse_patterns(pattern_file):
    """Parse a weight-remapping pattern file: alternating regex /
    replacement lines (reference utils/misc.py:97-111)."""
    patterns = []
    last_regex = None
    with open(pattern_file, "r") as text:
        for line in text:
            line = line.strip()
            if line == "" or line.startswith("#"):
                continue
            elif last_regex is None:
                last_regex = re.compile(line)
            else:
                patterns.append((last_regex, line))
                last_regex = None
    return patterns


def remap_weights(in_weights, patterns, verbose=False):
    """First-match regex rename with DISCARD sentinel
    (reference utils/misc.py:113-131)."""
    n_remapped = 0
    out_weights = {}
    for in_key, weight in in_weights.items():
        out_key = in_key
        discard = False
        for regex, replacement in patterns:
            out_key, n_matches = regex.subn(replacement, out_key)
            if n_matches > 0:
                if replacement == "DISCARD":
                    discard = True
                    out_key = "DISCARD"
                n_remapped += 1
                if verbose:
                    print(f"{in_key}  ==>  {out_key}")
                break
        if not discard:
            out_weights[out_key] = weight
    return out_weights, n_remapped
