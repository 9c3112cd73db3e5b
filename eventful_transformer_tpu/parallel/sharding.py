"""Parameter sharding rules: Megatron-style tensor parallelism for ViT
blocks, expressed as PartitionSpecs over a ("data", "model") mesh.

Column-parallel: qkv and mlp_1 kernels shard their OUTPUT dim (heads /
hidden units) over the model axis. Row-parallel: projection and mlp_2
kernels shard their INPUT dim; XLA/GSPMD inserts the psum at the block
boundary automatically. Everything else (LN, embeddings, class tokens,
classifier) is replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

COL_PARALLEL = {"qkv", "mlp_1"}
ROW_PARALLEL = {"projection", "mlp_2"}


def vit_param_spec(path_parts, leaf, tp_axis="model"):
    """PartitionSpec for one parameter, identified by its pytree path."""
    parent = path_parts[-1] if path_parts else ""
    if parent in COL_PARALLEL:
        if leaf == "kernel":
            return P(None, tp_axis)
        if leaf == "bias":
            return P(tp_axis)
    if parent in ROW_PARALLEL and leaf == "kernel":
        return P(tp_axis, None)
    return P()


def _map_with_path(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _map_with_path(v, fn, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_map_with_path(v, fn, path + (str(i),)) for i, v in enumerate(tree)]
    return fn(path[:-1], path[-1] if path else "", tree)


def vit_param_specs(params, tp_axis="model"):
    """PartitionSpec pytree matching a ViT/ViViT parameter pytree."""
    return _map_with_path(
        params, lambda parts, leaf, _: vit_param_spec(parts, leaf, tp_axis)
    )


def named_sharding(mesh, spec):
    return NamedSharding(mesh, spec)


def vit_param_shardings(mesh, params, tp_axis="model"):
    """NamedSharding pytree for the parameters over ``mesh``."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        vit_param_specs(params, tp_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh, params, tp_axis="model"):
    """Place a parameter pytree onto the mesh with TP shardings."""
    shardings = vit_param_shardings(mesh, params, tp_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
