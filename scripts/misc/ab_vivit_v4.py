"""3-way interleaved A/B at the ViViT K400 operating point: dense vs
eventful-v2mlp (the shipped default) vs eventful-v4 (whole-block kernel
pipeline, ops/pallas/block_fused.py).

The axon platform's call floor drifts MINUTE TO MINUTE (round-5 measured
dense at 45.6 and 32.2 clips/s twenty minutes apart on identical code),
so cross-process comparisons of eventful variants are confounded; this
script times all three programs cyclically in ONE process so drift hits
every variant alike.

    python scripts/misc/ab_vivit_v4.py [--iters 12]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from bench import build_model, _model_step  # noqa: E402
from eventful_transformer_tpu.utils.timing import (  # noqa: E402
    compile_parallel,
    scalar_probe,
)

# persistent cache (same dir as bench.py so its kernels are warm)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_bench")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--budget", type=float, default=0.5)
    args = ap.parse_args()

    n_tokens = (args.size // 16) ** 2 + 1
    k = int(args.budget * n_tokens)
    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal(
            (args.clips, args.views, args.frames, 3, args.size, args.size)
        ).astype(np.float32)
    )

    names = ["dense", "v2mlp", "v4"]
    models = [
        build_model(False, k, args.views, args.frames, args.size),
        # force v2mlp: auto now resolves to v4 on TPU for eligible blocks
        build_model(True, k, args.views, args.frames, args.size, fused="v2mlp"),
        build_model(True, k, args.views, args.frames, args.size, fused="v4"),
    ]
    jobs = []
    argss = []
    for m in models:
        m.frame_scan_unroll = 16
        step, sargs = _model_step(m, views, "bfloat16")
        probed = (lambda s: lambda *a: scalar_probe(s(*a)))(step)
        jobs.append((probed, sargs))
        argss.append(sargs)
    t0 = time.perf_counter()
    fns = compile_parallel(jobs)
    print(f"compile (concurrent, cached where warm): {time.perf_counter()-t0:.0f}s",
          flush=True)

    for fn, a in zip(fns, argss):
        float(fn(*a))
        float(fn(*a))
    times = {n: [] for n in names}
    for _ in range(args.iters):
        for n, fn, a in zip(names, fns, argss):
            t0 = time.perf_counter()
            float(fn(*a))
            times[n].append(time.perf_counter() - t0)
    med = {n: float(np.median(ts)) for n, ts in times.items()}
    iqr = {n: float(np.percentile(ts, 75) - np.percentile(ts, 25))
           for n, ts in times.items()}
    for n in names:
        print(f"{n:6s}: {args.clips/med[n]:7.2f} clips/s  "
              f"({1e3*med[n]:.1f} ms/batch, iqr {1e3*iqr[n]:.1f} ms)  "
              f"ratio vs dense {med['dense']/med[n]:.4f}", flush=True)


if __name__ == "__main__":
    main()
