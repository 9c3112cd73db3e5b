"""Data-parallel evaluation over a device mesh.

The reference's only cluster story is one-config-one-GPU Slurm jobs
(SURVEY.md §2.7). On TPU, videos are independent (temporal state resets per
video, utils/evaluate.py:30 in the reference), so the evaluation loop shards
trivially: D videos run as one batch with the CLIP axis laid out over the
"data" mesh axis. Weights are replicated; there is no cross-chip traffic in
the model — metrics aggregate on host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eventful_transformer_tpu.core.counting import Counts, Ctx
from eventful_transformer_tpu.utils.misc import TopKAccuracy


def make_sharded_vivit_step(model, params, mesh, count_mode=True):
    """views (D, V, T, C, H, W) sharded over the data axis -> probs (D, classes)."""
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, replicated)

    @jax.jit
    def step(p, views):
        ctx = Ctx(count_mode=count_mode)
        out = model.apply_views(ctx, p, views)
        return out, ctx.counts

    def run(views):
        views = jax.device_put(jnp.asarray(views), data_sharded)
        return step(params, views)

    return run


def evaluate_vivit_metrics_dp(model, params, data, config, mesh):
    """Data-parallel version of utils.evaluate.evaluate_vivit_metrics:
    processes len(mesh.data) videos per step."""
    dp = mesh.shape["data"]
    top_1, top_5 = TopKAccuracy(1), TopKAccuracy(5)
    step = make_sharded_vivit_step(model, params, mesh)
    n_items = min(config.get("n_items") or len(data), len(data))
    total_counts = Counts()
    processed = 0
    for start in range(0, n_items, dp):
        idx = [min(start + j, n_items - 1) for j in range(dp)]  # pad final group
        keep = [i < n_items - start for i in range(dp)]
        videos, labels = zip(*(data[i] for i in idx))
        views = np.stack(
            [np.stack(model.preprocessing(np.asarray(v)[None]), axis=1)[0] for v in videos]
        )
        output, counts = step(views)
        output = np.asarray(output)
        labels = np.asarray(labels)
        for j in range(dp):
            if not keep[j]:
                continue
            top_1.update(output[j : j + 1], labels[j : j + 1])
            top_5.update(output[j : j + 1], labels[j : j + 1])
            processed += 1
        total_counts = total_counts + Counts.from_device(counts)
    metrics = {"top_1": top_1.compute(), "top_5": top_5.compute()}
    counts = (total_counts / max(processed, 1)).nonzero()
    return {"metrics": metrics, "counts": counts}


def make_sharded_vitdet_step(model, params, mesh, count_mode=True):
    """One-video-per-data-shard ViTDet step: ``shard_map`` over the "data"
    axis with a LOCAL batch of 1, so the whole per-frame pipeline
    (pre_backbone -> backbone -> pyramid -> RPN -> ROI heads) runs
    unchanged per shard — zero cross-chip traffic in the model (videos are
    independent; the reference resets state per video), one ``psum`` for
    the FLOP counts.

    Returns ``step(state, frames, content_hw, first)`` where ``frames`` is
    (D, C, H, W), ``content_hw`` (D, 2), ``state`` a batch-D model state,
    and ``first`` selects the statically-split flush program (frame 0 of
    every video in the lockstep group). Outputs gain a leading D axis.
    """
    from jax.sharding import PartitionSpec as P

    from eventful_transformer_tpu.core.counting import Ctx

    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    data_spec = P("data")
    param_spec = jax.tree_util.tree_map(lambda _: P(), params)

    def make(mode):
        def local(p, state, frame, content_hw):
            ctx = Ctx(count_mode=count_mode)
            out, state = model.apply(
                ctx, p, state, frame, content_hw=content_hw[0], mode=mode
            )
            counts = jax.lax.psum(ctx.counts, "data") if count_mode else {}
            # local outputs are per-image (no batch axis); add one so the
            # global result stacks videos on the leading axis
            out = jax.tree_util.tree_map(lambda a: a[None], out)
            return out, state, counts

        def spec_of(tree, spec):
            # scalar state leaves (e.g. the `first` flush flag) carry no
            # batch axis and are identical across the lockstep group
            return jax.tree_util.tree_map(
                lambda a: spec if getattr(a, "ndim", 1) else P(), tree
            )

        def wrapped(state, frames, content_hw):
            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    param_spec,
                    spec_of(state, data_spec),
                    data_spec,
                    data_spec,
                ),
                out_specs=(data_spec, spec_of(state, data_spec), spec_of(
                    {} if not count_mode else _count_spec_template(), P()
                )),
                check_vma=False,
            )
            return jax.jit(fn)(params, state, frames, content_hw)

        return wrapped

    def _count_spec_template():
        from eventful_transformer_tpu.core.counting import zero_counts

        return zero_counts()

    flush, incremental = make("flush"), make("incremental")

    def step(state, frames, content_hw, first):
        return (flush if first else incremental)(state, frames, content_hw)

    return step


def evaluate_vitdet_metrics_dp(model, params, data, config, mesh):
    """Data-parallel version of scripts/evaluate/vitdet_vid.py::
    evaluate_vitdet_metrics: D videos run in lockstep, one per "data"
    shard; short videos repeat their last frame (results masked out on
    host). Metrics/counts match the sequential driver on the same items.
    """
    from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision

    dp = mesh.shape["data"]
    c, in_h, in_w = model.input_shape
    mean_ap = MeanAveragePrecision()
    step = make_sharded_vitdet_step(model, params, mesh)
    n_items = min(config.get("n_items") or len(data), len(data))
    total_counts = Counts()
    n_frames = 0
    for start in range(0, n_items, dp):
        idx = [min(start + j, n_items - 1) for j in range(dp)]
        videos = [data[i] for i in idx]
        lengths = [len(v) for v in videos]
        state = model.init_state(batch=dp)
        for t in range(max(lengths)):
            frames = np.zeros((dp, c, in_h, in_w), np.float32)
            hw = np.zeros((dp, 2), np.int32)
            anns = []
            for j, vid in enumerate(videos):
                frame, ann = vid[min(t, lengths[j] - 1)]
                frame = np.asarray(frame, np.float32)
                frames[j, :, : frame.shape[-2], : frame.shape[-1]] = frame
                hw[j] = frame.shape[-2:]
                anns.append(ann)
            out, state, counts = step(state, frames, hw, t == 0)
            masks = np.asarray(out["mask"])
            boxes, scores, labels = (
                np.asarray(out["boxes"]),
                np.asarray(out["scores"]),
                np.asarray(out["labels"]),
            )
            for j in range(dp):
                if idx[j] != start + j or t >= lengths[j]:
                    continue  # padding lane or repeated tail frame
                mean_ap.update(
                    [
                        {
                            "boxes": boxes[j][masks[j]],
                            "scores": scores[j][masks[j]],
                            "labels": labels[j][masks[j]],
                        }
                    ],
                    [anns[j]],
                )
                n_frames += 1
            # psum'd counts include padding lanes; scale to the valid share
            valid = sum(
                1
                for j in range(dp)
                if idx[j] == start + j and t < lengths[j]
            )
            total_counts = total_counts + Counts.from_device(counts) * (
                valid / dp
            )
    metrics = mean_ap.compute()
    counts = (total_counts / max(n_frames, 1)).nonzero()
    return {"metrics": metrics, "counts": counts}


def make_sequence_parallel_vitdet_step(model, params, mesh, axis="seq",
                                       count_mode=True):
    """Ulysses sequence-parallel ViTDet step: the backbone runs
    token-sharded inside a ``shard_map`` over ``axis`` (each block's
    ``sequence_parallel`` option issues the two all-to-alls that trade
    tokens for heads — parallel/sequence.py design), while pre_backbone
    and the detection head run replicated outside. Exact: attention per
    head group is computed over the FULL sequence; counts psum to the
    single-device totals.

    Requires a dense global-attention backbone (``sequence_parallel`` set
    in the block config, no windows/rel-pos) with N % P == 0 and
    heads % P == 0.

    Returns ``step(frame, content_hw) -> (out, counts)``.
    """
    from jax.sharding import PartitionSpec as P

    from eventful_transformer_tpu.core.counting import Ctx

    backbone = model.backbone
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    tok_spec = P(None, axis, None)

    def local(p, tokens, aux):
        ctx = Ctx(count_mode=count_mode)
        y, _ = backbone.apply(
            ctx, p, backbone.init_state(tokens.shape[0]), tokens, aux=aux
        )
        counts = jax.lax.psum(ctx.counts, axis) if count_mode else {}
        return y, counts

    def spec_of(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    @jax.jit
    def step(p, frame, content_hw):
        ctx = Ctx(count_mode=count_mode)
        tokens = model.pre_backbone(ctx, p, frame, content_hw)
        aux = backbone.precompute(p["backbone"])
        sp_apply = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_of(p["backbone"], P()), tok_spec,
                      spec_of(aux, tok_spec)),
            out_specs=(tok_spec, spec_of(ctx.counts, P())),
            check_vma=False,
        )
        tokens, bb_counts = sp_apply(p["backbone"], tokens, aux)
        if count_mode:
            # merge the psum'd backbone counts into the outer context
            # (component-wise add keeps the compensated-pair invariant:
            # value = sum + comp)
            ctx.counts = jax.tree_util.tree_map(
                lambda a, b: a + b, ctx.counts, bb_counts
            )
        out = model.post_backbone(ctx, p, tokens)
        return out, ctx.counts

    return lambda frame, content_hw: step(params, frame, content_hw)


def evaluate_vitdet_metrics_sp(model, params, data, config, mesh, axis="seq"):
    """Sequence-parallel version of the ViTDet eval driver (dense
    backbone): per-frame mAP protocol unchanged, backbone token-sharded
    over ``axis``."""
    from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision

    c, in_h, in_w = model.input_shape
    mean_ap = MeanAveragePrecision()
    step = make_sequence_parallel_vitdet_step(model, params, mesh, axis)
    n_items = min(config.get("n_items") or len(data), len(data))
    total_counts = Counts()
    n_frames = 0
    for i in range(n_items):
        vid_item = data[i]
        for t in range(len(vid_item)):
            frame, annotations = vid_item[t]
            frame = np.asarray(frame, np.float32)
            padded = np.zeros((1, c, in_h, in_w), np.float32)
            padded[0, :, : frame.shape[-2], : frame.shape[-1]] = frame
            content_hw = np.asarray(frame.shape[-2:], np.int32)
            out, counts = step(padded, content_hw)
            mask = np.asarray(out["mask"])
            mean_ap.update(
                [
                    {
                        "boxes": np.asarray(out["boxes"])[mask],
                        "scores": np.asarray(out["scores"])[mask],
                        "labels": np.asarray(out["labels"])[mask],
                    }
                ],
                [annotations],
            )
            total_counts = total_counts + Counts.from_device(counts)
            n_frames += 1
    metrics = mean_ap.compute()
    counts = (total_counts / max(n_frames, 1)).nonzero()
    return {"metrics": metrics, "counts": counts}
