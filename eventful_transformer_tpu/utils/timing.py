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


def time_repeated(fn, args, repeat=64, iters=5, warmup=1, perturb=None):
    """Time ``fn(*args)`` amortizing per-dispatch overhead: run ``repeat``
    data-dependent iterations inside ONE jit via ``lax.scan`` and divide.

    ``perturb(args, eps) -> args`` injects a scalar derived from the previous
    iteration's output into the next iteration's inputs (establishing a data
    dependence so XLA cannot batch or elide iterations). Default: adds
    ``eps`` to the first argument (costs one elementwise pass over it —
    measure an elementwise baseline with the same harness to calibrate).
    Returns seconds per single ``fn`` call.
    """
    if perturb is None:
        def perturb(a, eps):
            return (a[0] + eps.astype(a[0].dtype),) + tuple(a[1:])

    @jax.jit
    def looped(*a):
        def body(carry, _):
            eps, cur = carry
            out = fn(*cur)
            eps2 = scalar_probe(out) * jnp.float32(1e-20)
            return (eps2, perturb(cur, eps2)), None

        (eps, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), tuple(a)), None, length=repeat
        )
        return eps

    float(looped(*args))  # compile + first run
    for _ in range(max(warmup - 1, 0)):
        float(looped(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(looped(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / repeat


def compile_parallel(jobs):
    """AOT-compile [(fn, args), ...] CONCURRENTLY and return the compiled
    executables (callable with the same args). The platform's compile
    service parallelizes across requests (measured: 4 distinct programs in
    5.0 s threaded vs 23.3 s serial), so batching a workload's programs
    through one thread pool cuts its cold-start near-linearly — the lever
    that fits all six bench workloads inside the round driver's ~29 min
    kill window (BENCH_r03/r04 were rc=124 on serial compiles)."""
    from concurrent.futures import ThreadPoolExecutor

    if not jobs:
        return []
    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futs = [
            ex.submit(lambda f=f, a=a: jax.jit(f).lower(*a).compile())
            for f, a in jobs
        ]
        return [f.result() for f in futs]


def time_jitted_pair(fn_a, args_a, fn_b, args_b, iters=5, warmup=2,
                     full=False):
    """Time two jitted functions INTERLEAVED (A, B, A, B, ...) so clock /
    thermal / platform drift hits both alike — the A/B protocol behind every
    dense-vs-eventful ratio in docs/PERF_NOTES.md. Returns (sec_a, sec_b)
    medians, or the two raw time arrays with ``full=True`` (variance
    quantification: the axon remote call floor drifts run to run).
    The two programs compile concurrently (compile_parallel)."""

    def raw_a(*a):
        return scalar_probe(fn_a(*a))

    def raw_b(*a):
        return scalar_probe(fn_b(*a))

    probed_a, probed_b = compile_parallel([(raw_a, args_a), (raw_b, args_b)])

    for _ in range(max(warmup, 1)):
        float(probed_a(*args_a))
        float(probed_b(*args_b))
    times_a, times_b = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(probed_a(*args_a))
        times_a.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(probed_b(*args_b))
        times_b.append(time.perf_counter() - t0)
    if full:
        return np.asarray(times_a), np.asarray(times_b)
    return float(np.median(times_a)), float(np.median(times_b))


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
