"""Headline benchmark: Kinetics-400-protocol ViViT-B clips/sec on one chip,
eventful (50% token budget) vs dense, both at TPU-native bf16 serving
precision, throughput mode (8 clips batched; clips are independent streams).

Prints one JSON line per workload; the CANONICAL driver metric (ViViT
clips/s) prints FIRST, and later workloads self-schedule against
``--budget-seconds`` so a driver timeout can never drop the headline:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value``  = eventful clips/sec/chip (full apply_views pipeline: tubelet
             embedding + 12-block spatial scan over 16 frames x views +
             temporal model + classifier).
``vs_baseline`` = speedup over the dense ViViT-B measured under identical
             conditions — including the framework's own dense-path kernels
             (ops/pallas/dense_mlp.py), so the baseline is the OPTIMIZED
             dense, not a strawman. The >= 2.0 north-star (BASELINE.json)
             is a FLOP-count result at this token count (N=197); the
             wall-clock ceiling analysis is in docs/PERF_NOTES.md, and the
             wall-clock wins live at ViTDet token counts (second metric).

Default eventful variant is EventfulTokenwiseBlock — the wall-clock optimum
at ViViT token counts (see docs/PERF_NOTES.md; EventfulBlock is the
FLOP-count optimum and the ViTDet default). Per-video flush + steady-state
frames follow the reference protocol (SURVEY.md §6).
"""

import argparse
import json
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeat bench runs skip the multi-minute
# XLA compiles (first run unchanged).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_bench")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def build_model(eventful, k, views, frames, size=224, budget_cast="bfloat16",
                block_class="EventfulTokenwiseBlock", fused=None,
                topk_in_kernel=False, no_share=False):
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.gating import TokenGate
    from eventful_transformer_tpu.core.policies import TokenNormTopK
    from eventful_transformer_tpu.models import FactorizedViViT

    spatial_block = dict(dim=768, heads=12, mlp_ratio=4)
    if eventful and block_class != "EventfulTokenwiseBlock":
        spatial_block["matmul_2_cast"] = budget_cast
    config = dict(
        classes=400,
        input_shape=[frames, 3, size, size],
        normalize_mean=0.45,
        normalize_std=0.225,
        spatial_views=1,
        temporal_stride=2,
        temporal_views=views,
        tubelet_shape=[2, 16, 16],
        spatial_config=dict(
            depth=12,
            position_encoding_size=[14, 14],
            block_class=block_class if eventful else "Block",
            block_config=spatial_block,
        ),
        temporal_config=dict(
            depth=4,
            position_encoding_size=[16],
            block_config=dict(dim=768, heads=12, mlp_ratio=4),
        ),
    )
    model = FactorizedViViT(**config)
    if eventful:
        for gate in model.modules_of_type(TokenGate):
            gate.policy = TokenNormTopK(k=k)
        if fused is not None:
            for blk in model.modules_of_type(EventfulTokenwiseBlock):
                blk.fused_gates = {"False": False}.get(fused, fused)
        if topk_in_kernel:
            for blk in model.modules_of_type(EventfulTokenwiseBlock):
                blk.in_kernel_topk = True
        if no_share:
            for blk in model.modules_of_type(EventfulTokenwiseBlock):
                blk.share_gate_passes = False
    return model


def _model_step(model, views, dtype=None):
    from eventful_transformer_tpu.core.counting import Ctx

    params = model.init(jax.random.PRNGKey(0))
    if dtype is not None:
        cast = lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x
        params = jax.tree_util.tree_map(cast, params)
        views = views.astype(dtype)

    # Params must be an ARGUMENT: closed-over arrays are baked into the HLO
    # as constants (bloats the program past compile limits).
    def step(p, v):
        return model.apply_views(Ctx(), p, v)

    return step, (params, views)


def time_model(model, views, iters, warmup=2, dtype=None):
    from eventful_transformer_tpu.utils.timing import time_jitted

    step, args = _model_step(model, views, dtype)
    return time_jitted(step, args, iters=iters, warmup=warmup)


def build_vitdet_backbone(eventful, size=672):
    """ViTDet-B backbone at the reference VID operating points
    (configs/evaluate/vitdet_vid/spatiotemporal_672.yml): 8 windowed blocks
    + 4 global; eventful = EventfulBlock global (k/v pool 2, bf16 A-V cast)
    + EventfulTokenwiseBlock windowed."""
    from eventful_transformer_tpu.core.backbones import ViTBackbone

    hw = size // 16
    block_config = dict(
        dim=768, heads=12, mlp_ratio=4,
        relative_embedding_size=[64, 64], window_size=[14, 14],
    )
    if eventful:
        block_config.update(pool_size=2, matmul_2_cast="bfloat16")
        kwargs = dict(
            block_class="EventfulBlock",
            windowed_class="EventfulTokenwiseBlock",
            windowed_overrides=dict(pool_size=None, matmul_2_cast=None),
        )
    else:
        kwargs = dict(block_class="Block")
    return ViTBackbone(
        block_config=block_config,
        depth=12,
        position_encoding_size=[14, 14],
        input_size=(hw, hw),
        window_indices=[0, 1, 3, 4, 6, 7, 9, 10],
        **kwargs,
    )


def bench_vitdet(args, size):
    """Second driver metric: ViTDet-B backbone ms/frame at ``size``, dense vs
    eventful spatiotemporal k=256, 2 independent streams, interleaved A/B
    measurement, steady-state (state passed in post-flush) — the reference
    timing protocol (scripts/time/vitdet_vid.py:17-56) with the flush frame
    excluded."""
    import time

    from eventful_transformer_tpu.core.counting import Ctx
    from eventful_transformer_tpu.core.gating import TokenGate
    from eventful_transformer_tpu.core.policies import TokenNormTopK
    from eventful_transformer_tpu.utils.timing import (
        compile_parallel,
        scalar_probe,
    )

    streams, frames_per_call, k = getattr(args, "streams", 2) or 2, 16, 256
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    n = (size // 16) ** 2

    def setup(eventful):
        from eventful_transformer_tpu.core.blocks import EventfulBlock

        model = build_vitdet_backbone(eventful, size)
        if eventful:
            for blk in model.blocks:
                for gate in blk.modules_of_type(TokenGate):
                    gate.policy = TokenNormTopK(k=k)
                if getattr(args, "no_share", False):
                    blk.share_gate_passes = False
                if getattr(args, "no_resident", False):
                    blk.window_resident_qkv = False
                if isinstance(blk, EventfulBlock):
                    if args.fuse_mm1:
                        blk.fuse_matmul_1 = True
                    if args.av_kernel:
                        blk.av_kernel = True
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params
        )
        frames = jnp.asarray(
            rng.standard_normal((frames_per_call, streams, n, 768)).astype(np.float32)
        ).astype(dtype)

        def fwd(p, state, fr, mode=None):
            aux = model.precompute(p)

            def body(carry, x):
                y, s = model.apply(Ctx(), p, carry, x, aux, mode=mode)
                return s, scalar_probe(y)

            # unroll trades compile time for fewer while-loop back-edge
            # copies of the eventful state (profiled ~1.9 ms/frame at 672;
            # full unroll: eventful 13.9 -> 12.5 ms/frame)
            unroll = args.unroll if args.unroll > 0 else fr.shape[0]
            state, probes = jax.lax.scan(body, state, fr, unroll=unroll)
            return state, jnp.sum(probes)

        return fwd, params, model.init_state(streams, dtype), frames

    d_raw, d_params, d_state, d_frames = setup(False)
    e_raw, e_params, e_state, e_frames = setup(True)
    # Steady-state scan is statically incremental: no per-block
    # flush/incremental lax.cond in the hot loop (see Block.apply). All
    # three programs compile CONCURRENTLY (the compile service
    # parallelizes; see compile_parallel) — and the dense path needs no
    # flush program at all (dense block state is empty, flush == steady).
    d_fwd, e_fwd, e_flush = compile_parallel([
        (partial(d_raw, mode=None), (d_params, d_state, d_frames)),
        (partial(e_raw, mode="incremental"), (e_params, e_state, e_frames)),
        (partial(e_raw, mode="flush"), (e_params, e_state, e_frames[:1])),
    ])
    # flush frame once; timing runs steady-state only
    e_state, probe = e_flush(e_params, e_state, e_frames[:1])
    float(probe)
    # warm both
    float(d_fwd(d_params, d_state, d_frames)[1])
    float(e_fwd(e_params, e_state, e_frames)[1])
    d_times, e_times = [], []
    for _ in range(args.iters):  # interleaved A/B
        t0 = time.perf_counter()
        float(d_fwd(d_params, d_state, d_frames)[1])
        d_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(e_fwd(e_params, e_state, e_frames)[1])
        e_times.append(time.perf_counter() - t0)
    d_t = float(np.median(d_times)) / frames_per_call
    e_t = float(np.median(e_times)) / frames_per_call
    return {
        "metric": f"vitdet_b_{size}_backbone_eventful_fps_1chip",
        "value": round(streams / e_t, 4),
        "unit": "frames/s",
        "vs_baseline": round(d_t / e_t, 4),
        "detail": {
            "dense_ms_per_frame": round(d_t * 1e3, 3),
            "eventful_ms_per_frame": round(e_t * 1e3, 3),
            "k": k,
            "n_tokens": n,
            "streams": streams,
            "frames_per_call": frames_per_call,
            "config": (
                f"spatiotemporal_{size} (EventfulBlock pool 2 + windowed Tokenwise)"
            ),
            "dtype": args.dtype or "float32",
        },
    }


def bench_vitdet_e2e(args, size):
    """Full-pipeline ViTDet frame latency at batch 1 — the reference timing
    protocol (scripts/time/vitdet_vid.py:17-56): pre_backbone + backbone +
    SimplePyramid + RPN + ROI heads per frame, steady-state (flush frame
    excluded), dense (base_{size}) vs eventful (spatiotemporal_{size},
    k=256) built from the actual eval configs. Frames are scanned in-jit
    (state dependence serializes them), so the per-frame number is true
    on-device latency without the remote platform's per-dispatch overhead.
    """
    import time

    from eventful_transformer_tpu.core.counting import Ctx
    from eventful_transformer_tpu.core.policies import TokenNormTopK
    from eventful_transformer_tpu.models.vitdet import ViTDet
    from eventful_transformer_tpu.utils.config import load_config
    from eventful_transformer_tpu.utils.misc import set_policies
    from eventful_transformer_tpu.utils.timing import scalar_probe

    frames_per_call, k = 8, 256
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)

    def setup(config_name):
        from eventful_transformer_tpu.core.blocks import (
            EventfulBlock,
            EventfulTokenwiseBlock,
        )

        config = load_config(f"configs/evaluate/vitdet_vid/{config_name}.yml")
        model = ViTDet(**config["model"])
        eventful = bool(config.get("token_top_k"))
        if eventful:
            set_policies(model, TokenNormTopK, k=k)
            for blk in model.modules_of_type(EventfulTokenwiseBlock):
                if getattr(args, "no_share", False):
                    blk.share_gate_passes = False
            for blk in model.modules_of_type(EventfulBlock):
                if args.av_kernel:
                    blk.av_kernel = True
                if args.fuse_mm1:
                    blk.fuse_matmul_1 = True
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params
        )
        frames = jnp.asarray(
            rng.random((frames_per_call, 1, 3, size, size), dtype=np.float32)
        ).astype(dtype)

        def fwd(p, state, fr, mode=None):
            aux = model.precompute(p)

            def body(carry, frame):
                out, s = model.apply(Ctx(), p, carry, frame, aux, mode=mode)
                return s, scalar_probe(out)

            # Measured (round 3): at BATCH 1 the scan wins — full unroll
            # made eventful 15.4 vs 14.2 ms/frame (the 1-stream state is
            # small, so back-edge copies are cheap and unrolling only
            # bloats the schedule). Opposite of the 2-stream backbone
            # bench, where full unroll is worth ~1.5 ms/frame.
            unroll = args.unroll if args.unroll > 0 else 1
            state, probes = jax.lax.scan(body, state, fr, unroll=unroll)
            return state, jnp.sum(probes)

        return fwd, params, model.init_state(1, dtype), frames

    d_raw, d_params, d_state, d_frames = setup(f"base_{size}")
    e_raw, e_params, e_state, e_frames = setup(f"spatiotemporal_{size}")
    # Static flush-then-incremental split (frame 0 of a video always
    # flushes): no per-block lax.cond in the steady-state loop. Programs
    # compile concurrently; the dense path needs no flush program (dense
    # state is empty, flush == steady).
    from eventful_transformer_tpu.utils.timing import compile_parallel

    d_fwd, e_fwd, e_flush = compile_parallel([
        (partial(d_raw, mode=None), (d_params, d_state, d_frames)),
        (partial(e_raw, mode="incremental"), (e_params, e_state, e_frames)),
        (partial(e_raw, mode="flush"), (e_params, e_state, e_frames[:1])),
    ])
    e_state, probe = e_flush(e_params, e_state, e_frames[:1])
    float(probe)
    float(d_fwd(d_params, d_state, d_frames)[1])
    float(e_fwd(e_params, e_state, e_frames)[1])
    d_times, e_times = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(d_fwd(d_params, d_state, d_frames)[1])
        d_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(e_fwd(e_params, e_state, e_frames)[1])
        e_times.append(time.perf_counter() - t0)
    d_t = float(np.median(d_times)) / frames_per_call
    e_t = float(np.median(e_times)) / frames_per_call
    return {
        "metric": f"vitdet_b_{size}_e2e_eventful_fps_batch1",
        "value": round(1.0 / e_t, 4),
        "unit": "frames/s",
        "vs_baseline": round(d_t / e_t, 4),
        "detail": {
            "dense_ms_per_frame": round(d_t * 1e3, 3),
            "eventful_ms_per_frame": round(e_t * 1e3, 3),
            "k": k,
            "batch": 1,
            "pipeline": "pre_backbone+backbone+pyramid+rpn+roi",
            "config": f"spatiotemporal_{size} vs base_{size}",
            "dtype": args.dtype or "float32",
        },
    }


def bench_vivit_throughput(args):
    """Canonical driver metric: ViViT-B K400 clips/s/chip at the 50% token
    budget, 8-clip batch, eventful vs dense interleaved A/B."""
    n_tokens = (args.size // 16) ** 2 + 1
    k = int(args.budget * n_tokens)

    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal(
            (args.clips, args.views, args.frames, 3, args.size, args.size)
        ).astype(np.float32)
    )

    from eventful_transformer_tpu.utils.timing import time_jitted_pair

    dense = build_model(False, k, args.views, args.frames, args.size)
    dense.frame_scan_unroll = args.vivit_unroll
    eventful = build_model(
        True, k, args.views, args.frames, args.size, block_class=args.block,
        fused=args.fused, topk_in_kernel=args.topk_in_kernel,
        no_share=args.no_share,
    )
    eventful.frame_scan_unroll = args.vivit_unroll
    # Interleaved A/B: clock/platform drift hits both paths alike.
    d_step, d_args = _model_step(dense, views, args.dtype)
    e_step, e_args = _model_step(eventful, views, args.dtype)
    dense_t, eventful_t = time_jitted_pair(
        d_step, d_args, e_step, e_args, iters=args.iters
    )

    clips_per_sec = args.clips / eventful_t
    return {
        "metric": "vivit_b_k400_clips_per_sec_1chip_50pct_budget",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": round(dense_t / eventful_t, 4),
        "detail": {
            "dense_s_per_clip": round(dense_t / args.clips, 4),
            "eventful_s_per_clip": round(eventful_t / args.clips, 4),
            "dense_clips_per_sec": round(args.clips / dense_t, 4),
            "k": k,
            "n_tokens": n_tokens,
            "clips": args.clips,
            "views": args.views,
            "frames": args.frames,
            "block": args.block,
            "dtype": args.dtype or "float32",
            "device": jax.devices()[0].device_kind,
        },
    }


def bench_vivit_latency(args):
    """Batch-1 latency (the paper's edge regime): one clip, its views
    batched as the protocol requires, per-clip wall-clock."""
    n_tokens = (args.size // 16) ** 2 + 1
    k = int(args.budget * n_tokens)
    rng = np.random.default_rng(0)
    one = jnp.asarray(
        rng.standard_normal(
            (1, args.views, args.frames, 3, args.size, args.size)
        ).astype(np.float32)
    )
    from eventful_transformer_tpu.utils.timing import time_jitted_pair

    dense_l = build_model(False, k, args.views, args.frames, args.size)
    event_l = build_model(
        True, k, args.views, args.frames, args.size, block_class=args.block,
        fused=args.fused,
    )
    dense_l.frame_scan_unroll = args.vivit_unroll
    event_l.frame_scan_unroll = args.vivit_unroll
    d_step, d_args = _model_step(dense_l, one, args.dtype)
    e_step, e_args = _model_step(event_l, one, args.dtype)
    d_ts, e_ts = time_jitted_pair(
        d_step, d_args, e_step, e_args, iters=args.iters, full=True
    )
    d_t, e_t = float(np.median(d_ts)), float(np.median(e_ts))
    # variance bars (VERDICT r3 ask 7): interquartile range of the
    # interleaved samples quantifies the remote-platform call-floor noise
    # that made the round-3 driver (0.95x) and builder (1.00x) numbers
    # disagree on identical code
    iqr = lambda ts: float(np.percentile(ts, 75) - np.percentile(ts, 25))
    return {
        "metric": "vivit_b_k400_latency_ms_per_clip_batch1",
        "value": round(e_t * 1e3, 3),
        "unit": "ms/clip",
        "vs_baseline": round(d_t / e_t, 4),
        "detail": {
            "dense_ms_per_clip": round(d_t * 1e3, 3),
            "n_samples": int(len(e_ts)),
            "eventful_iqr_ms": round(iqr(e_ts) * 1e3, 3),
            "dense_iqr_ms": round(iqr(d_ts) * 1e3, 3),
            "k": k, "views": args.views, "frames": args.frames,
            "block": args.block, "dtype": args.dtype or "float32",
        },
    }


def bench_vivit_flops(args):
    """FLOP-parity line (the paper's own metric): counted GFLOPs/clip at the
    canonical ViViT-B K400 operating point, dense vs eventful at the 50%
    token budget. Counts come from the framework's traced counting
    (core/counting.py — key semantics golden-tested against the reference's
    eventful_transformer/counting.py), so this is the computation-savings
    number the ICCV paper reports (~2-4x), measured by the driver alongside
    the wall-clock lines it contextualizes (docs/PERF_NOTES.md: the batched
    bf16 MXU wall-clock ceiling at N=197 is far below the FLOP ratio).

    Runs on CPU (counts are platform-independent; the `all` schedule spawns
    this as a subprocess so it costs the TPU budget nothing)."""
    jax.config.update("jax_platforms", "cpu")  # before any device use

    from eventful_transformer_tpu.core.counting import COUNT_KEYS, Ctx, count_value

    n_tokens = (args.size // 16) ** 2 + 1
    k = int(args.budget * n_tokens)
    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal(
            (1, args.views, args.frames, 3, args.size, args.size)
        ).astype(np.float32)
    )

    def counted_total(model):
        def step(p, v):
            ctx = Ctx(count_mode=True)
            model.apply_views(ctx, p, v)
            return ctx.counts

        params = model.init(jax.random.PRNGKey(0))
        counts = jax.jit(step)(params, views)
        by_key = {
            kk: count_value(v) for kk, v in counts.items()
            if kk != "policy_saturated"  # not a FLOP count
        }
        return sum(by_key.values()), by_key

    dense_total, dense_keys = counted_total(
        build_model(False, k, args.views, args.frames, args.size)
    )
    ev_total, ev_keys = counted_total(
        build_model(
            True, k, args.views, args.frames, args.size,
            block_class=args.block, fused=args.fused,
        )
    )
    # Supplementary points for the re-baseline table (docs/PERF_NOTES.md):
    # EventfulBlock is the FLOP-count optimum (gates the attention matmuls
    # too; reference blocks.py:399-575), and k=24 is the budget the
    # reference's published K400 operating point trains at
    # (configs/evaluate/vivit_kinetics400/temporal_24.yml).
    evblk_total, _ = counted_total(
        build_model(
            True, k, args.views, args.frames, args.size,
            block_class="EventfulBlock",
        )
    )
    ev24_total, _ = counted_total(
        build_model(
            True, 24, args.views, args.frames, args.size,
            block_class=args.block, fused=args.fused,
        )
    )
    evblk24_total, _ = counted_total(
        build_model(
            True, 24, args.views, args.frames, args.size,
            block_class="EventfulBlock",
        )
    )
    g = 1e9
    return {
        "metric": "vivit_b_k400_gflops_per_clip_50pct_budget",
        "value": round(ev_total / g, 2),
        "unit": "GFLOPs/clip",
        # the FLOP-savings ratio — the reference paper's headline metric
        "vs_baseline": round(dense_total / ev_total, 4),
        "detail": {
            "dense_gflops_per_clip": round(dense_total / g, 2),
            "per_key_gflops": {
                kk: [round(dense_keys[kk] / g, 3), round(ev_keys[kk] / g, 3)]
                for kk in sorted(dense_keys)
                if dense_keys[kk] or ev_keys[kk]
            },
            "k": k, "n_tokens": n_tokens, "views": args.views,
            "frames": args.frames, "block": args.block,
            "eventful_block_gflops_per_clip": round(evblk_total / g, 2),
            "eventful_block_ratio": round(dense_total / evblk_total, 4),
            "k24_gflops_per_clip": round(ev24_total / g, 2),
            "k24_ratio": round(dense_total / ev24_total, 4),
            "k24_eventful_block_gflops_per_clip": round(evblk24_total / g, 2),
            "k24_eventful_block_ratio": round(dense_total / evblk24_total, 4),
            "note": "counted per core/counting.py; key semantics "
                    "golden-tested vs the reference counting",
        },
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=4)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--budget", type=float, default=0.5)
    parser.add_argument("--clips", type=int, default=8)
    parser.add_argument(
        "--dtype", default="bfloat16", choices=[None, "bfloat16", "float32"],
        help="compute dtype applied to BOTH models (bf16 is TPU-native serving precision)",
    )
    parser.add_argument("--vitdet-size", type=int, default=0,
        help="vitdet input size (672 or 1024); 0 = run both")
    parser.add_argument("--streams", type=int, default=2,
        help="independent video streams (batch) for the vitdet backbone "
        "workload")
    parser.add_argument("--vivit-unroll", type=int, default=16,
        help="frame-scan unroll for the vivit models (compile time grows "
        "with unroll x the already-unrolled eventful block stack). Full "
        "unroll (16 steps at the K400 point) + the static flush split it "
        "auto-enables measured 46.7 vs 42.7 clips/s eventful over the "
        "unroll=1 cond-dispatched scan (docs/PERF_NOTES.md round 3)")
    parser.add_argument("--unroll", type=int, default=0,
        help="frame-scan unroll factor for the vitdet workload; 0 = full "
        "unroll (measured: while-loop back-edge copies of the eventful "
        "state cost ~1.5 ms/frame at 672, docs/PERF_NOTES.md)")
    parser.add_argument("--fused", default=None,
        help="force gate-fusion mode on eventful blocks: "
        "v2mlp/v2/v1/v1v2/v3/blocked/False")
    parser.add_argument("--av-kernel", action="store_true",
        help="force the fused A-V kernel on EventfulBlock even below "
        "AV_KERNEL_MIN_COLS (re-measure the 672 dispatch with --fuse-mm1, "
        "whose traffic profile differs)")
    parser.add_argument("--fuse-mm1", action="store_true",
        help="force matmul-1 fusion into the A-V kernel on EventfulBlock "
        "even where the per-shape auto default would not dispatch it "
        "(the auto rule follows av_kernel; see EventfulBlock.fuse_matmul_1)")
    parser.add_argument("--no-resident", action="store_true",
        help="disable the window-resident qkv buffer on windowed tokenwise "
        "blocks (A/B lever for the resident-layout win; see "
        "EventfulTokenwiseBlock.window_resident_qkv)")
    parser.add_argument("--no-share", action="store_true",
        help="disable gate-pass sharing (the proj/MLP kernels' next-gate "
        "norms emission; A/B lever for docs/PERF_NOTES.md round 4)")
    parser.add_argument("--topk-in-kernel", action="store_true",
        help="force in-kernel radix-bisection top-k selection inside the "
        "fused gate-group kernels (vivit workload)")
    parser.add_argument(
        "--block",
        default="EventfulTokenwiseBlock",
        choices=["EventfulTokenwiseBlock", "EventfulMatmul1Block", "EventfulBlock"],
        help="eventful block variant; Tokenwise is the wall-clock optimum at "
        "ViViT scale (attention eventfulness pays off at ViTDet token counts)",
    )
    parser.add_argument(
        "--workload", default="all",
        choices=["all", "vivit", "vitdet", "vitdet-e2e", "vivit-latency",
                 "flops"],
        help="which benchmark(s) to run; the canonical ViViT K400 clips/s "
        "line prints FIRST so a timeout can never drop it",
    )
    parser.add_argument(
        "--budget-seconds", type=float,
        default=float(os.environ.get("BENCH_BUDGET_S", 1450)),
        help="soft wall-clock budget for the whole run. The canonical "
        "metric always runs; each later workload is skipped (stderr note) "
        "if its cold-compile-inclusive cost estimate no longer fits. "
        "Default calibrated to the round driver's OBSERVED kill window "
        "(~1740 s from the BENCH_r03/r04 artifact timestamps; rc=124 both "
        "rounds with 3000) minus rc-0 headroom. A warm persistent compile "
        "cache (~/.cache/jax_bench, primed by running this script once "
        "beforehand) fits all six workloads comfortably.",
    )
    args = parser.parse_args()

    import sys
    import time as _time

    t_start = _time.perf_counter()

    def elapsed():
        return _time.perf_counter() - t_start

    # (name, cold-compile-inclusive cost estimate in seconds, thunk).
    # Ordered by importance: the canonical driver metric first, then the
    # ViTDet backbone wins, then e2e latency, then ViViT batch-1 latency.
    def schedule(workloads):
        est_scale = 1.0
        for i, (name, est, thunk) in enumerate(workloads):
            fits = elapsed() + est * est_scale <= args.budget_seconds
            if i > 0 and not fits:
                print(
                    f"bench: skipping {name} (elapsed {elapsed():.0f}s + "
                    f"est {est * est_scale:.0f}s > budget "
                    f"{args.budget_seconds:.0f}s)",
                    file=sys.stderr, flush=True,
                )
                continue
            t0 = _time.perf_counter()
            print(json.dumps(thunk()), flush=True)
            took = _time.perf_counter() - t0
            print(f"bench: {name} took {took:.0f}s (est {est * est_scale:.0f}s, "
                  f"elapsed {elapsed():.0f}s)", file=sys.stderr, flush=True)
            # Adapt later estimates to observed cache state: warm-cache
            # runs come in far under the cold estimates.
            est_scale = min(est_scale, max(took / est, 0.1))

    if args.workload == "all":
        # FLOP-parity line: counted on CPU in a subprocess, CONCURRENT with
        # the TPU workloads below — costs the TPU budget nothing. Collected
        # (with a budget-bounded wait) after the schedule finishes.
        import subprocess

        flops_proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--workload", "flops"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        # Priority order (VERDICT r4 asks 1-2): canonical ViViT metric
        # first, then the reference's headline regime (batch-1 e2e at
        # 1024), then the backbone wins, then the rest.
        # Cold estimates assume CONCURRENT compiles (compile_parallel; the
        # serial-compile costs measured r05 were 383/228/317/255/163/436 s
        # = 1782 s total, past the driver's ~1740 s kill window).
        schedule([
            ("vivit", 450, lambda: bench_vivit_throughput(args)),
            ("vitdet-e2e-1024", 300, lambda: bench_vitdet_e2e(args, 1024)),
            ("vitdet-1024", 300, lambda: bench_vitdet(args, 1024)),
            ("vitdet-672", 250, lambda: bench_vitdet(args, 672)),
            ("vitdet-e2e-672", 250, lambda: bench_vitdet_e2e(args, 672)),
            ("vivit-latency", 280, lambda: bench_vivit_latency(args)),
        ])
        # Collect the FLOP-parity subprocess (never jeopardizes rc=0: a
        # failure or an over-budget wait just drops this supplementary line)
        try:
            wait = max(30.0, args.budget_seconds - elapsed())
            out, _ = flops_proc.communicate(timeout=wait)
            if flops_proc.returncode == 0 and out.strip():
                print(out.strip(), flush=True)
            else:
                print(f"bench: flops subprocess rc={flops_proc.returncode}",
                      file=sys.stderr, flush=True)
        except Exception as e:
            flops_proc.kill()
            print(f"bench: flops subprocess dropped ({e})",
                  file=sys.stderr, flush=True)
        return

    if args.workload == "vivit":
        print(json.dumps(bench_vivit_throughput(args)), flush=True)
    elif args.workload == "vitdet":
        sizes = (672, 1024) if args.vitdet_size == 0 else (args.vitdet_size,)
        for size in sizes:
            print(json.dumps(bench_vitdet(args, size)), flush=True)
    elif args.workload == "vitdet-e2e":
        sizes = (672, 1024) if args.vitdet_size == 0 else (args.vitdet_size,)
        for size in sizes:
            print(json.dumps(bench_vitdet_e2e(args, size)), flush=True)
    elif args.workload == "vivit-latency":
        print(json.dumps(bench_vivit_latency(args)), flush=True)
    elif args.workload == "flops":
        print(json.dumps(bench_vivit_flops(args)), flush=True)


if __name__ == "__main__":
    main()
