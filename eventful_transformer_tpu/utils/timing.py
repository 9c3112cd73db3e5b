"""Wall-clock timing that is correct on remote-execution platforms.

On the axon TPU platform, ``jax.block_until_ready`` returns without waiting
(verified empirically: it reports 400,000 TFLOP/s), and full-array
device->host transfers go through a slow tunnel. Reliable protocol: have the
jitted function reduce its output to a SCALAR on device, and synchronize by
reading that scalar back (4 bytes)."""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def scalar_probe(tree):
    """Reduce an output pytree to one scalar on device (cheap, un-DCE-able)."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        total = total + jnp.sum(leaf).astype(jnp.float32)
    return total


def time_jitted(fn, args, iters=5, warmup=2, median=True):
    """Time ``fn(*args)`` where fn is jit-compiled and returns a pytree.
    Wraps fn so it reduces to a scalar on device; each timed call reads the
    scalar back to synchronize. Returns seconds per call."""

    @jax.jit
    def probed(*a):
        return scalar_probe(fn(*a))

    float(probed(*args))  # compile + first run
    for _ in range(max(warmup - 1, 0)):
        float(probed(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(probed(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) if median else np.mean(times))
