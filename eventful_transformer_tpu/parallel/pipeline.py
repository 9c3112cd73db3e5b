"""Pipeline parallelism over the block stack (GPipe-style, frames as
micro-batches).

The reference has no distributed execution at all (SURVEY.md §2.7). On TPU,
video streaming makes pipelining natural: split the depth-D homogeneous
block stack into P contiguous stages laid out over a "pipe" mesh axis;
frame t enters stage 0 while frame t-1 is in stage 1, so after a P-1 step
fill bubble every stage computes every step. Activations hop stages over
ICI via ``jax.lax.ppermute``; per-stage temporal state (the eventful
gates/buffers) never leaves its chip.

Static-shape discipline: every stage runs every step; steps outside a
stage's valid window (the fill/drain bubble) compute on placeholder data
and their STATE UPDATES ARE MASKED, so eventful temporal state stays
exactly equal to the sequential execution's.

Scope: homogeneous stacks (identical block structure per stage) with
depth % P == 0; counting is off inside the pipeline (use the single-chip
path for FLOP accounting). Output equals the sequential frame scan exactly
(tested on a virtual CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eventful_transformer_tpu.core.counting import Ctx


def _stack_stage_trees(trees, n_stages):
    """[per-block trees] -> (stage-leading) stacked tree: (P, L/P, ...)."""
    per_block = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, a.shape[0] // n_stages) + a.shape[1:]),
        per_block,
    )


def make_pipelined_backbone(backbone, mesh, axis="pipe"):
    """Build ``run(params, state, frames) -> (outputs, state)`` executing the
    backbone's block stack as a P-stage pipeline over ``mesh[axis]``.

    frames: (T, B, N, C) time-major (position encoding NOT applied — this
    drives the block stack only, mirroring ViTBackbone.apply after its
    position encoding). Returns outputs (T, B, N, C) and the updated
    per-block state list, both exactly equal to the sequential scan.
    """
    n_stages = mesh.shape[axis]
    depth = len(backbone.blocks)
    assert depth % n_stages == 0, (depth, n_stages)
    assert backbone.homogeneous, "pipeline stages must be structurally equal"
    block = backbone.blocks[0]
    per_stage = depth // n_stages

    def stage_apply(params_stage, state_stage, x):
        """Run this stage's L/P blocks sequentially (a layer scan)."""

        def body(carry, layer):
            p, s = layer
            y, s = block.apply(Ctx(), p, s, carry)
            return y, s

        x, new_state = jax.lax.scan(body, x, (params_stage, state_stage))
        return x, new_state

    def per_device(params_stage, state_stage, frames):
        # shard_map gives each device its (1, L/P, ...) slice; drop the
        # stage axis.
        params_stage = jax.tree_util.tree_map(lambda a: a[0], params_stage)
        state_stage = jax.tree_util.tree_map(lambda a: a[0], state_stage)
        stage = jax.lax.axis_index(axis)
        t_total = frames.shape[0]
        n_steps = t_total + n_stages - 1
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def step(carry, s):
            state_stage, x_in = carry
            # stage p works on frame s - p; valid inside [0, T)
            frame_idx = s - stage
            valid = (frame_idx >= 0) & (frame_idx < t_total)
            my_frame = jax.lax.dynamic_index_in_dim(
                frames, jnp.clip(frame_idx, 0, t_total - 1), keepdims=False
            )
            x = jnp.where(stage == 0, my_frame, x_in)
            y, new_state = stage_apply(params_stage, state_stage, x)
            # bubble steps must not disturb eventful temporal state
            state_stage = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old), new_state, state_stage
            )
            x_next = jax.lax.ppermute(y, axis, perm)
            return (state_stage, x_next), y

        # mark the seed activation as device-varying (it becomes the
        # ppermute output, which varies over the pipe axis)
        x0 = jax.lax.pcast(jnp.zeros_like(frames[0]), (axis,), to="varying")
        (state_stage, _), ys = jax.lax.scan(
            step, (state_stage, x0), jnp.arange(n_steps)
        )
        # re-add the stage axis for the P(axis)-sharded outputs
        expand = lambda a: a[None]
        return (
            jax.tree_util.tree_map(expand, ys),
            jax.tree_util.tree_map(expand, state_stage),
        )

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        # The blocks' flush/incremental lax.cond creates fresh (unvarying)
        # state constants that the varying-manual-axes type system rejects
        # against the carried (varying) state; replication checking is
        # unnecessary here (every output is explicitly stage-sharded).
        check_vma=False,
    )

    @jax.jit
    def run(params, state, frames):
        params_staged = _stack_stage_trees(params["blocks"], n_stages)
        state_staged = _stack_stage_trees(state["blocks"], n_stages)
        ys, state_staged = mapped(params_staged, state_staged, frames)
        t_total = frames.shape[0]
        # outputs: the LAST stage's ys, steps P-1 .. P-1+T
        outputs = ys[n_stages - 1, n_stages - 1 : n_stages - 1 + t_total]
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((depth,) + a.shape[2:]), state_staged
        )
        new_state = [
            jax.tree_util.tree_map(lambda a, i=i: a[i], flat) for i in range(depth)
        ]
        return outputs, {"blocks": new_state}

    return run
