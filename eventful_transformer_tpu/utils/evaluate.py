"""Evaluation driver with policy sweeps (reference utils/evaluate.py).

The reference mutates gate policies in-place and re-runs the same model
object. Under JAX, a policy change alters static capacities, so each sweep
entry constructs a FRESH jitted step (one XLA compilation per token budget,
as designed in SURVEY.md §7.2)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax

from eventful_transformer_tpu.core.counting import (
    Counts,
    Ctx,
    dict_csv_header,
    dict_csv_line,
    dict_string,
)
from eventful_transformer_tpu.core.policies import (
    TokenNormThreshold,
    TokenNormTopFraction,
    TokenNormTopK,
)
from eventful_transformer_tpu.utils.misc import TopKAccuracy, set_policies, tee_print
from eventful_transformer_tpu.utils.params import load_params


def _progress(iterable):
    try:
        from tqdm import tqdm

        return tqdm(iterable, ncols=0)
    except ImportError:
        return iterable


def get_device_description():
    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind} x{jax.device_count()}"


def make_vivit_step(model, params, count_mode=True):
    """Build a jitted views->(probs, counts) step. Must be rebuilt whenever
    policies change (jit caches key on arguments, not closures). Params are
    passed as an argument — closed-over arrays would be baked into the HLO
    as constants."""

    @jax.jit
    def step(p, views):
        ctx = Ctx(count_mode=count_mode)
        out = model.apply_views(ctx, p, views)
        return out, ctx.counts

    return lambda views: step(params, views)


def make_bucketed_vivit_step(model, params, config):
    """Capacity-bucketed per-VIDEO dispatch for threshold-policy ViViT eval
    (utils/bucketing.py, here at video granularity: ``apply_views`` builds
    fresh state per call, so an escalating re-run of the whole video is
    exact by construction). Returns None unless the current sweep entry is
    a threshold policy and ``bucket_capacities`` is configured."""
    from eventful_transformer_tpu.core.gating import TokenGate
    from eventful_transformer_tpu.utils.bucketing import BucketedThresholdStep

    buckets = config.get("bucket_capacities")
    gates = model.modules_of_type(TokenGate)
    policy = gates[0].policy if gates else None
    if not (buckets and isinstance(policy, TokenNormThreshold)):
        return None

    def build_step(_capacity=None):
        @jax.jit
        def jitted(p, views):
            ctx = Ctx(count_mode=True)
            out = model.apply_views(ctx, p, views)
            return out, ctx.counts

        def step(state, views):
            out, counts = jitted(params, views)
            return out, state, counts

        return step

    dispatcher = BucketedThresholdStep(
        model, build_step, policy.threshold, buckets
    )

    def step(views):
        out, _, counts = dispatcher(None, views)
        return out, counts

    step.dispatcher = dispatcher
    return step


def evaluate_vivit_metrics(model, params, data, config):
    """Top-1/top-5 + per-item counts over a video classification dataset
    (reference utils/evaluate.py:22-39). State resets per video by
    construction: each ``apply_views`` builds fresh state."""
    top_1 = TopKAccuracy(k=1)
    top_5 = TopKAccuracy(k=5)
    step = make_bucketed_vivit_step(model, params, config) or make_vivit_step(
        model, params
    )
    n_items = config.get("n_items") or len(data)
    n_items = min(n_items, len(data))
    total_counts = Counts()
    for i in _progress(range(n_items)):
        video, label = data[i]
        views = model.preprocessing(np.asarray(video)[None])
        views = np.stack(views, axis=1)
        output, counts = step(views)
        output = np.asarray(output)
        top_1.update(output, np.asarray(label))
        top_5.update(output, np.asarray(label))
        total_counts = total_counts + Counts.from_device(counts)
    metrics = {"top_1": top_1.compute(), "top_5": top_5.compute()}
    counts = (total_counts / n_items).nonzero()
    return {"metrics": metrics, "counts": counts}


def run_evaluations(config, model_class, data, evaluate_function):
    """Policy-sweep evaluation loop with tee'd text + CSV outputs
    (reference utils/evaluate.py:42-93)."""
    model = model_class(**config["model"])
    params = _load_model_params(model, config)

    completed = []
    output_dir = Path(config["_output"])
    output_dir.mkdir(parents=True, exist_ok=True)
    # Optional resume: skip sweep entries already present in metrics.csv
    # (SURVEY.md §5: eval-resume from CSV row count).
    skip = 0
    metrics_csv = output_dir / "metrics.csv"
    if config.get("resume") and metrics_csv.is_file():
        skip = max(len(metrics_csv.read_text().strip().splitlines()) - 1, 0)
        print(f"Resuming: skipping {skip} completed sweep entries", flush=True)

    def do_evaluation(title):
        nonlocal skip
        if skip > 0:
            skip -= 1
            completed.append(title)
            return
        with open(output_dir / "output.txt", "a") as tee_file:
            results = evaluate_function(model, params, data, config)
            tee_print(title, tee_file)
            tee_print(get_device_description(), tee_file)
            if isinstance(results, dict):
                save_csv_results(
                    results, output_dir,
                    first_run=(len(completed) == 0 and not metrics_csv.is_file()),
                )
                for key, val in results.items():
                    tee_print(key.capitalize(), tee_file)
                    tee_print(dict_string(val), tee_file)
            else:
                tee_print(results, tee_file)
            tee_print("", tee_file)
            completed.append(title)

    if config.get("vanilla", False):
        do_evaluation("Vanilla")
    for k in config.get("token_top_k", []):
        set_policies(model, TokenNormTopK, k=k)
        do_evaluation(f"Token top k={k}")
    for fraction in config.get("token_top_fraction", []):
        set_policies(model, TokenNormTopFraction, fraction=fraction)
        do_evaluation(f"Token top {fraction * 100:.1f}%")
    for threshold in config.get("token_thresholds", []):
        capacity = config.get("threshold_capacity")
        set_policies(model, TokenNormThreshold, threshold=threshold, capacity=capacity)
        do_evaluation(f"Token threshold {threshold}")
    return completed


def _load_model_params(model, config):
    weights = config.get("weights")
    if weights and Path(weights).is_file():
        template = model.init(jax.random.PRNGKey(0))
        return load_params(weights, like=template)
    if weights:
        print(f"WARNING: weights file {weights} not found; using random init")
    return model.init(jax.random.PRNGKey(config.get("seed", 0)))


def save_csv_results(results, output_dir, first_run=False):
    for key, val in results.items():
        with open(Path(output_dir) / f"{key}.csv", "a") as csv_file:
            if first_run:
                print(dict_csv_header(val), file=csv_file)
            print(dict_csv_line(val), file=csv_file)
