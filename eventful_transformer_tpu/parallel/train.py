"""Sharded training step: dp (batch over "data") x tp (heads/hidden over
"model") via jit + NamedSharding, XLA inserting the collectives.

The reference trains only the temporal sub-model on cached spatial outputs
(utils/train.py:13-105, gradients never flow through gates — SURVEY.md
§3.3); this module provides both that path and a full dense-ViViT training
step used by the multi-chip dry run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.parallel.sharding import vit_param_shardings


def cross_entropy_from_probs(probs, labels, eps=1e-9):
    """CE over the model's softmax outputs (the model returns probabilities,
    matching the reference's softmax-at-the-end design, models/vivit.py:136)."""
    logp = jnp.log(probs + eps)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_sharded_train_step(model, optimizer, mesh, full_model=True):
    """Build (init_fn, step_fn) for dp x tp training of a FactorizedViViT.

    ``full_model=True`` trains end-to-end on views (the multi-chip dry-run
    path); ``full_model=False`` trains the temporal sub-model on cached
    spatial features (the reference's fine-tuning path).
    """
    data_spec = P("data")

    def loss_fn(params, batch, rng):
        ctx = Ctx(training=True, rng=rng)
        if full_model:
            probs = model.apply_views(ctx, params, batch["inputs"])
        else:
            probs = model._forward_temporal(
                ctx, params, batch["inputs"], batch["inputs"].shape[0]
            )
        return cross_entropy_from_probs(probs, batch["labels"])

    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_fn(params):
        param_shardings = vit_param_shardings(mesh, params)
        params = jax.tree_util.tree_map(jax.device_put, params, param_shardings)
        # zeros_like inside optax.init preserves param shardings for the
        # moment/variance trees; scalars (step counts) must be replicated
        # onto the mesh explicitly.
        opt_state = optimizer.init(params)
        replicated = NamedSharding(mesh, P())
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated) if jnp.ndim(x) == 0 else x,
            opt_state,
        )
        return params, opt_state, param_shardings

    def make_jitted(params, opt_state, param_shardings):
        opt_shardings = jax.tree_util.tree_map(
            lambda x: x.sharding if hasattr(x, "sharding") else NamedSharding(mesh, P()),
            opt_state,
        )
        batch_shardings = {
            "inputs": NamedSharding(mesh, data_spec),
            "labels": NamedSharding(mesh, data_spec),
        }
        return jax.jit(
            train_step,
            in_shardings=(
                param_shardings,
                opt_shardings,
                batch_shardings,
                NamedSharding(mesh, P()),
            ),
            out_shardings=(param_shardings, opt_shardings, NamedSharding(mesh, P())),
            donate_argnums=(0, 1),
        )

    return init_fn, make_jitted
