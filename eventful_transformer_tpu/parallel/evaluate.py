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
