"""Measure the ViViT capacity-bucket ladder (threshold-policy wall-clock).

For each capacity in the ladder, compile the ViViT spatial step with
TokenNormThreshold at that capacity and measure clip throughput — the
per-bucket cost table behind utils/bucketing.py's escalating dispatch for
the K400 workload (the ViTDet table is in docs/PERF_NOTES.md; the
reference's threshold protocol is configs/evaluate/*/threshold_*.yml +
policies.py:6-36).

Usage:
    python scripts/misc/measure_vivit_buckets.py [--capacities 24 49 98 197]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacities", type=int, nargs="+",
                    default=[24, 49, 98, 197])
    ap.add_argument("--threshold", type=float, default=1.0)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench
    from eventful_transformer_tpu.core.counting import Ctx
    from eventful_transformer_tpu.core.policies import TokenNormThreshold
    from eventful_transformer_tpu.utils.misc import set_policies
    from eventful_transformer_tpu.utils.timing import time_jitted

    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal((args.clips, 4, 32, 3, 224, 224)).astype(np.float32)
    ).astype(jnp.bfloat16)

    rows = []
    for capacity in args.capacities:
        model = bench.build_model(True, capacity, 4, 32, 224)
        model.frame_scan_unroll = 16
        set_policies(
            model, TokenNormThreshold,
            threshold=args.threshold, capacity=capacity,
        )
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        step = jax.jit(lambda p, v: model.apply_views(Ctx(), p, v))
        t = time_jitted(step, (params, views), iters=args.iters)
        clips_s = args.clips / t
        rows.append((capacity, t / args.clips * 1e3, clips_s))
        print(
            f"capacity {capacity:4d}: {t / args.clips * 1e3:7.2f} ms/clip "
            f"({clips_s:6.2f} clips/s)",
            flush=True,
        )
    print("| capacity | ms/clip | clips/s |")
    print("|---|---|---|")
    for capacity, ms, cs in rows:
        print(f"| {capacity} | {ms:.2f} | {cs:.2f} |")


if __name__ == "__main__":
    main()
