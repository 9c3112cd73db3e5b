"""Per-op self-time profile of a benchmark workload on the live device.

Runs one of the bench.py workloads under ``jax.profiler.trace`` and prints
the top ops by total device self-time, aggregated by HLO op category — the
measurement loop behind the layout findings in docs/PERF_NOTES.md (the
reference's analog is the segment timer in scripts/time/vitdet_vid.py:36-44;
this is the per-op refinement XLA makes possible).

Usage:
    python scripts/misc/profile_ops.py vitdet --eventful --size 672
    python scripts/misc/profile_ops.py vivit --eventful --budget 0.5
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401

import numpy as np

import jax
import jax.numpy as jnp


def _trace_and_parse(run, iters=2):
    """Trace `run()` x iters; return [(name, total_us, count)] by self-time."""
    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        for _ in range(iters):
            run()
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
        if not paths:
            raise RuntimeError("no trace written")
        with gzip.open(paths[0], "rt") as f:
            trace = json.load(f)
    # Device-lane complete events only (host lanes carry python/runtime noise).
    device_pids = {
        e["pid"]
        for e in trace["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and re.search(r"TPU|/device:|XLA", str(e.get("args", {}).get("name", "")))
    }
    per_op = collections.defaultdict(lambda: [0.0, 0])
    per_src = collections.defaultdict(lambda: [0.0, 0])
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        per_op[name][0] += e.get("dur", 0.0)
        per_op[name][1] += 1
        args = e.get("args", {})
        src = args.get("source_info") or args.get("source") or ""
        if src:
            key = f"{_category(name)} @ {src}"
            per_src[key][0] += e.get("dur", 0.0)
            per_src[key][1] += 1
    by_src = sorted(
        ((k, v[0], v[1]) for k, v in per_src.items()), key=lambda t: -t[1]
    )
    return sorted(
        ((k, v[0], v[1]) for k, v in per_op.items()), key=lambda t: -t[1]
    ), by_src


def _category(name):
    """Fold HLO instruction names into coarse categories."""
    base = re.sub(r"[.\d]+$", "", name)
    for pat in ("fusion", "copy", "reshape", "transpose", "convert", "dot",
                "conv", "scatter", "gather", "reduce", "select", "broadcast",
                "dynamic-slice", "dynamic-update-slice", "custom-call", "sort",
                "iota", "bitcast", "all-reduce", "concatenate", "pad", "slice"):
        if base.startswith(pat):
            return pat
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["vitdet", "vivit", "vitdet-e2e"])
    ap.add_argument("--eventful", action="store_true")
    ap.add_argument("--size", type=int, default=672)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--budget", type=float, default=0.5)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--streams", type=int, default=2,
        help="independent video streams (batch) for the vitdet backbone")
    ap.add_argument("--fuse-mm1", action="store_true")
    ap.add_argument("--av-kernel", action="store_true")
    ap.add_argument("--filter", default=None, help="only list ops matching this regex")
    ap.add_argument("--fused", default=None)
    ap.add_argument("--block", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench

    if args.workload == "vitdet":
        from eventful_transformer_tpu.core.counting import Ctx
        from eventful_transformer_tpu.core.gating import TokenGate
        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.utils.timing import scalar_probe
        from functools import partial

        from eventful_transformer_tpu.core.blocks import EventfulBlock

        model = bench.build_vitdet_backbone(args.eventful, args.size)
        if args.eventful:
            for blk in model.blocks:
                for gate in blk.modules_of_type(TokenGate):
                    gate.policy = TokenNormTopK(k=args.k)
                if args.fused is not None:
                    blk.fused_gates = {"False": False}.get(args.fused, args.fused)
                if isinstance(blk, EventfulBlock):
                    if args.fuse_mm1:
                        blk.fuse_matmul_1 = True
                    if args.av_kernel:
                        blk.av_kernel = True
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        n = (args.size // 16) ** 2
        frames = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((args.frames, args.streams, n, 768))
            .astype(np.float32)
        ).astype(jnp.bfloat16)

        def fwd(p, state, fr, mode=None):
            aux = model.precompute(p)

            def body(carry, x):
                y, s = model.apply(Ctx(), p, carry, x, aux, mode=mode)
                return s, scalar_probe(y)

            # full unroll to match the bench configuration
            state, probes = jax.lax.scan(body, state, fr, unroll=fr.shape[0])
            return state, jnp.sum(probes)

        jit_fwd = jax.jit(
            partial(fwd, mode="incremental" if args.eventful else None)
        )
        state0 = model.init_state(args.streams, jnp.bfloat16)
        state, probe = jax.jit(
            partial(fwd, mode="flush" if args.eventful else None)
        )(params, state0, frames[:1])
        float(probe)
        float(jit_fwd(params, state, frames)[1])  # warm
        run = lambda: float(jit_fwd(params, state, frames)[1])
    elif args.workload == "vitdet-e2e":
        # batch-1 full pipeline (bench.bench_vitdet_e2e setup, one side)
        from functools import partial

        from eventful_transformer_tpu.core.counting import Ctx
        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.models.vitdet import ViTDet
        from eventful_transformer_tpu.utils.config import load_config
        from eventful_transformer_tpu.utils.misc import set_policies
        from eventful_transformer_tpu.utils.timing import scalar_probe

        name = (
            f"spatiotemporal_{args.size}" if args.eventful else f"base_{args.size}"
        )
        config = load_config(f"configs/evaluate/vitdet_vid/{name}.yml")
        model = ViTDet(**config["model"])
        if args.eventful:
            set_policies(model, TokenNormTopK, k=args.k)
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        frames = jnp.asarray(
            np.random.default_rng(0)
            .random((8, 1, 3, args.size, args.size), dtype=np.float32)
        ).astype(jnp.bfloat16)

        def fwd(p, state, fr, mode=None):
            aux = model.precompute(p)

            def body(carry, frame):
                out, s = model.apply(Ctx(), p, carry, frame, aux, mode=mode)
                return s, scalar_probe(out)

            state, probes = jax.lax.scan(body, state, fr)
            return state, jnp.sum(probes)

        jit_fwd = jax.jit(
            partial(fwd, mode="incremental" if args.eventful else None)
        )
        state = model.init_state(1, jnp.bfloat16)
        state, probe = jax.jit(
            partial(fwd, mode="flush" if args.eventful else None)
        )(params, state, frames[:1])
        float(probe)
        float(jit_fwd(params, state, frames)[1])  # warm
        run = lambda: float(jit_fwd(params, state, frames)[1])
    else:
        n_tokens = 197
        k = int(args.budget * n_tokens)
        model = bench.build_model(
            args.eventful, k, 4, 32, 224,
            block_class=args.block or "EventfulTokenwiseBlock",
            fused=args.fused,
        )
        # match the bench defaults (full unroll -> auto static split)
        model.frame_scan_unroll = 16
        from eventful_transformer_tpu.core.counting import Ctx

        params = model.init(jax.random.PRNGKey(0))
        cast = lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a
        params = jax.tree_util.tree_map(cast, params)
        views = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((args.clips, 4, 32, 3, 224, 224))
            .astype(np.float32)
        ).astype(jnp.bfloat16)

        step = jax.jit(lambda p, v: model.apply_views(Ctx(), p, v))
        from eventful_transformer_tpu.utils.timing import scalar_probe as _  # noqa

        out = step(params, views)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[..., :1, :1]) if hasattr(a, "shape") else a, out
        )
        run = lambda: np.asarray(step(params, views)[0][..., :1]).sum()

    rows, by_src = _trace_and_parse(run)
    total = sum(r[1] for r in rows)
    print(f"total device self-time: {total/1e3:.2f} ms over traced calls")
    print(f"{'us':>10}  {'n':>6}  op")
    listed = rows
    if args.filter:
        pat = re.compile(args.filter)
        listed = [r for r in rows if pat.search(r[0])]
    for name, dur, cnt in listed[: args.top]:
        print(f"{dur:10.0f}  {cnt:6d}  {name[:110]}")
    cats = collections.defaultdict(float)
    for name, dur, _ in rows:
        cats[_category(name)] += dur
    print("\nby category:")
    for cat, dur in sorted(cats.items(), key=lambda t: -t[1])[:15]:
        print(f"{dur:10.0f}  {100*dur/max(total,1):5.1f}%  {cat}")
    if by_src:
        print("\nby category @ source:")
        for key, dur, cnt in by_src[: args.top]:
            print(f"{dur:10.0f}  {cnt:6d}  {key[:140]}")


if __name__ == "__main__":
    main()
