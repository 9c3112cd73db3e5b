"""Headline benchmark: Kinetics-400-protocol ViViT-B clips/sec on one chip,
eventful (50% token budget) vs dense, both at TPU-native bf16 serving
precision, throughput mode (8 clips batched; clips are independent streams).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value``  = eventful clips/sec/chip (full apply_views pipeline: tubelet
             embedding + 12-block spatial scan over 16 frames x views +
             temporal model + classifier).
``vs_baseline`` = speedup over the dense ViViT-B measured under identical
             conditions (the reference publishes no absolute numbers,
             BASELINE.md); the north-star is >= 2.0 (BASELINE.json).

Default eventful variant is EventfulTokenwiseBlock — the wall-clock optimum
at ViViT token counts (see docs/PERF_NOTES.md; EventfulBlock is the
FLOP-count optimum and the ViTDet default). Per-video flush + steady-state
frames follow the reference protocol (SURVEY.md §6).
"""

import argparse
import json
import os

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
                block_class="EventfulTokenwiseBlock", fused=None):
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
    return model


def time_model(model, views, iters, warmup=2, dtype=None):
    from eventful_transformer_tpu.core.counting import Ctx
    from eventful_transformer_tpu.utils.timing import time_jitted

    params = model.init(jax.random.PRNGKey(0))
    if dtype is not None:
        cast = lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x
        params = jax.tree_util.tree_map(cast, params)
        views = views.astype(dtype)

    # Params must be an ARGUMENT: closed-over arrays are baked into the HLO
    # as constants (bloats the program past compile limits).
    def step(p, v):
        return model.apply_views(Ctx(), p, v)

    return time_jitted(step, (params, views), iters=iters, warmup=warmup)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=4)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--budget", type=float, default=0.5)
    parser.add_argument("--clips", type=int, default=8)
    parser.add_argument(
        "--dtype", default="bfloat16", choices=[None, "bfloat16", "float32"],
        help="compute dtype applied to BOTH models (bf16 is TPU-native serving precision)",
    )
    parser.add_argument("--fused", default=None,
        help="force gate-fusion mode on eventful blocks: v2mlp/v2/v1/False")
    parser.add_argument(
        "--block",
        default="EventfulTokenwiseBlock",
        choices=["EventfulTokenwiseBlock", "EventfulMatmul1Block", "EventfulBlock"],
        help="eventful block variant; Tokenwise is the wall-clock optimum at "
        "ViViT scale (attention eventfulness pays off at ViTDet token counts)",
    )
    args = parser.parse_args()

    n_tokens = (args.size // 16) ** 2 + 1
    k = int(args.budget * n_tokens)

    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal(
            (args.clips, args.views, args.frames, 3, args.size, args.size)
        ).astype(np.float32)
    )

    dense = build_model(False, k, args.views, args.frames, args.size)
    dense_t = time_model(dense, views, args.iters, dtype=args.dtype)
    eventful = build_model(
        True, k, args.views, args.frames, args.size, block_class=args.block,
        fused=args.fused,
    )
    eventful_t = time_model(eventful, views, args.iters, dtype=args.dtype)

    clips_per_sec = args.clips / eventful_t
    result = {
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
    print(json.dumps(result))


if __name__ == "__main__":
    main()
