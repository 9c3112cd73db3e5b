"""Temporal-sub-model fine-tuning (reference utils/train.py:13-105).

The only training path in the reference: the temporal sub-model +
classifier are fine-tuned on CACHED spatial outputs (gates run frozen in the
spatial model; gradients never flow through them — SURVEY.md §3.3).

Parity note: the reference applies ``nn.CrossEntropyLoss`` to the model
output, which is already softmax probabilities (models/vivit.py:136) — i.e.
it optimizes CE over softmax(probs). We mirror that exactly via
``optax.softmax_cross_entropy_with_integer_labels`` on the model output.

JAX-native: optax optimizer, jitted train/eval steps, gradients masked to
the temporal_model + classifier subtrees (matching the reference's optimizer
over those parameters only, utils/train.py:29-33).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.utils.misc import MeanValue, TopKAccuracy, seeded_shuffle
from eventful_transformer_tpu.utils.params import load_params, save_params

TRAINED_SUBTREES = ("temporal_model", "classifier")


def make_optimizer(config):
    name = config.get("optimizer", "AdamW").lower()
    kwargs = dict(config.get("optimizer_kwargs", {}))
    lr = kwargs.pop("lr", 1e-4)
    factory = {"adamw": optax.adamw, "adam": optax.adam, "sgd": optax.sgd}[name]
    opt = factory(lr, **kwargs)
    # Train only the temporal model + classifier (reference utils/train.py:29-33).
    def label_fn(params):
        return {k: ("train" if k in TRAINED_SUBTREES else "freeze") for k in params}

    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, label_fn
    )


def make_train_functions(model, optimizer):
    def loss_fn(params, inputs, labels, rng, training):
        ctx = Ctx(training=training, rng=rng)
        probs = model._forward_temporal(ctx, params, inputs, inputs.shape[0])
        loss = optax.softmax_cross_entropy_with_integer_labels(probs, labels).mean()
        return loss, probs

    @jax.jit
    def train_step(params, opt_state, inputs, labels, rng):
        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, inputs, labels, rng, True
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, probs

    @jax.jit
    def eval_step(params, inputs, labels):
        loss, probs = loss_fn(params, inputs, labels, None, False)
        return loss, probs

    return train_step, eval_step


def _batches(data, batch_size, shuffle, seed):
    order = list(range(len(data)))
    if shuffle:
        seeded_shuffle(order, seed)
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            continue  # keep static shapes: drop the ragged tail
        items = [data[i] for i in idx]
        inputs = jnp.asarray(np.stack([np.asarray(x) for x, _ in items]))
        labels = jnp.asarray(np.asarray([y for _, y in items], dtype=np.int32))
        yield inputs, labels


def train_vivit_temporal(config, train_data, val_data, model_class=None):
    """Fine-tune the temporal sub-model on cached spatial outputs
    (reference utils/train.py:13-105). Returns (params, history)."""
    from eventful_transformer_tpu.models import FactorizedViViT

    model_class = model_class or FactorizedViViT
    model = model_class(**config["model"])
    template = model.init(jax.random.PRNGKey(42))
    start = config.get("starting_weights")
    if start:
        params = load_params(start, like=template)
    else:
        params = template

    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    train_step, eval_step = make_train_functions(model, optimizer)

    mean_loss, top_1, top_5 = MeanValue(), TopKAccuracy(1), TopKAccuracy(5)
    history = []
    rng = jax.random.PRNGKey(42)
    tensorboard = _make_tensorboard(config)

    def log_epoch(key, step):
        entry = {
            "pass": key,
            "step": step,
            "loss": mean_loss.compute(),
            "top_1": top_1.compute(),
            "top_5": top_5.compute(),
        }
        history.append(entry)
        if tensorboard is not None:
            tensorboard.add_scalars("loss", {key: entry["loss"]}, step)
            tensorboard.add_scalars("top_1", {key: entry["top_1"]}, step)
            tensorboard.add_scalars("top_5", {key: entry["top_5"]}, step)
        print(
            f"Loss: {entry['loss']:.4f}; Top-1: {entry['top_1']:.4f}; "
            f"Top-5: {entry['top_5']:.4f}",
            flush=True,
        )
        return entry

    def run_pass(step, training):
        nonlocal params, opt_state, rng
        mean_loss.reset(), top_1.reset(), top_5.reset()
        data = train_data if training else val_data
        batch_size = config["train_batch_size" if training else "val_batch_size"]
        for inputs, labels in _batches(data, batch_size, training, seed=42 + step):
            if training:
                rng, sub = jax.random.split(rng)
                params, opt_state, loss, probs = train_step(
                    params, opt_state, inputs, labels, sub
                )
            else:
                loss, probs = eval_step(params, inputs, labels)
            mean_loss.update(float(loss))
            top_1.update(np.asarray(probs), np.asarray(labels))
            top_5.update(np.asarray(probs), np.asarray(labels))
        return log_epoch("train" if training else "val", step)

    # Full-state checkpoint/resume (params + optimizer + epoch), beyond the
    # reference's weights-only saves (utils/checkpoint.py, Orbax).
    ckpt_dir = config.get("checkpoint_dir")
    start_epoch = 0
    if ckpt_dir:
        from eventful_transformer_tpu.utils.checkpoint import (
            latest_epoch,
            restore_train_state,
            save_train_state,
        )

        done = latest_epoch(ckpt_dir)
        if done is not None:
            params, opt_state = restore_train_state(ckpt_dir, done, params, opt_state)
            start_epoch = done
            print(f"Resumed from {ckpt_dir} at epoch {done}", flush=True)

    print("Validation pass", flush=True)
    run_pass(start_epoch, training=False)
    n_epochs = config["epochs"]
    for epoch in range(start_epoch, n_epochs):
        print(f"\nEpoch {epoch + 1}/{n_epochs}", flush=True)
        print("Training pass", flush=True)
        run_pass(epoch + 1, training=True)
        print("Validation pass", flush=True)
        run_pass(epoch + 1, training=False)
        if ckpt_dir:
            save_train_state(ckpt_dir, epoch + 1, params, opt_state)

    if tensorboard is not None:
        tensorboard.close()
    if config.get("output_weights"):
        save_params(config["output_weights"], params)
        print(f"Saved weights to {config['output_weights']}", flush=True)
    return params, history


def _make_tensorboard(config):
    """TensorBoard scalar logging (reference utils/train.py:41-57), gated on
    the config key and on torch's SummaryWriter being importable."""
    if "tensorboard" not in config:
        return None
    try:
        from datetime import datetime

        from torch.utils.tensorboard import SummaryWriter

        now = datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
        return SummaryWriter(f"{config['tensorboard']}_{now}")
    except Exception as exc:  # missing backend: log to console only
        print(f"WARNING: tensorboard disabled ({exc})", flush=True)
        return None
