"""Device-mesh construction.

The reference has no distributed runtime (SURVEY.md §2.7); on TPU the
equivalents are first-class: a ``jax.sharding.Mesh`` over ICI with
data-parallel evaluation (videos are independent — state resets per video)
and Megatron-style tensor parallelism over attention heads / MLP hidden
units for training.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("data", "model"), devices=None):
    """Build a mesh over available devices.

    ``shape=None`` puts all devices on the first (data) axis. A ``-1`` entry
    is inferred. Axis names default to ("data", "model") for dp x tp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def best_dp_tp_mesh(n_devices=None, max_tp=4, devices=None):
    """Pick a (data, model) mesh: the largest tp <= max_tp dividing the
    device count (tp traffic is heavier, so it gets the inner/faster axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    tp = 1
    for cand in range(min(max_tp, n), 0, -1):
        if n % cand == 0:
            tp = cand
            break
    return make_mesh((n // tp, tp), ("data", "model"), devices)


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (jax.distributed) for pod slices. Single-
    host/single-chip runs need not call this. Arguments default to the
    standard TPU environment auto-detection."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
