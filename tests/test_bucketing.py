"""Bucketed threshold dispatch: exactness via saturation escalation.

A tiny eventful block sequence is driven with frames whose changed-token
count first fits the small bucket, then exceeds it. The dispatcher must
(a) match the full-capacity reference results on every frame, (b) actually
run the cheap bucket when demand is low, and (c) escalate when a gate
saturates."""

import numpy as np

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
from eventful_transformer_tpu.core.counting import count_value, Ctx
from eventful_transformer_tpu.core.policies import TokenNormThreshold
from eventful_transformer_tpu.utils.bucketing import BucketedThresholdStep
from eventful_transformer_tpu.utils.misc import set_policies

DIM, HEADS, MLP, N = 32, 4, 2, 24
THRESHOLD = 1.0


def _make_block():
    blk = EventfulTokenwiseBlock(dim=DIM, heads=HEADS, mlp_ratio=MLP, input_size=(4, 6))
    params = blk.init(jax.random.PRNGKey(0))
    return blk, params


def _frames(rng, t, changed_per_frame):
    frames = [rng.standard_normal((1, N, DIM)).astype(np.float32)]
    for n_changed in changed_per_frame:
        f = frames[-1].copy()
        idx = rng.choice(N, n_changed, replace=False)
        f[0, idx] += 3.0 * rng.standard_normal((n_changed, DIM)).astype(np.float32)
        frames.append(f)
    return frames


class TestBucketedThreshold:
    def test_exact_and_escalating(self, rng):
        blk, params = _make_block()

        def build_step(_capacity=None):
            @jax.jit
            def jitted(p, state, x):
                ctx = Ctx(count_mode=True)
                y, state = blk.apply(ctx, p, state, x)
                return y, state, ctx.counts

            return lambda state, x: jitted(params, state, x)

        # low demand (2-3 changed tokens), then a burst (20 tokens)
        changed = [2, 3, 2, 20, 20, 2, 2]
        frames = _frames(rng, len(changed), changed)

        # reference: full capacity (== exact variable-k semantics)
        set_policies(blk, TokenNormThreshold, threshold=THRESHOLD, capacity=N)
        full = build_step()
        state = blk.init_state(1, N)
        want = []
        for f in frames:
            y, state, _ = full(state, jnp.asarray(f))
            want.append(np.asarray(y))

        dispatcher = BucketedThresholdStep(
            blk, build_step, THRESHOLD, capacities=[6, 12, N], decay_interval=3
        )
        state = blk.init_state(1, N)
        dispatcher.reset()
        got = []
        for f in frames:
            y, state, _ = dispatcher(state, jnp.asarray(f))
            got.append(np.asarray(y))

        for t, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5, err_msg=f"frame {t}")
        # the burst forced escalation, and the cheap bucket did real work
        assert dispatcher.escalations >= 1
        assert dispatcher.frames_per_level[0] >= 3

    def test_saturation_count_emitted(self, rng):
        blk, params = _make_block()
        set_policies(blk, TokenNormThreshold, threshold=THRESHOLD, capacity=4)
        frames = _frames(rng, 2, [20])
        ctx = Ctx(count_mode=True)
        state = blk.init_state(1, N)
        _, state = blk.apply(ctx, params, state, jnp.asarray(frames[0]))
        _, state = blk.apply(ctx, params, state, jnp.asarray(frames[1]))
        assert count_value(ctx.counts["policy_saturated"]) > 0

    def test_step_for_reinstalls_policies_on_cached_buckets(self):
        """A bucket's step can hold more than one LAZILY-traced program
        (the flush/incremental split in scripts/evaluate/vitdet_vid.py);
        a program first called after another bucket's set_policies would
        trace at the wrong capacity. _step_for must therefore re-install
        the policies even when the bucket is cached."""
        from eventful_transformer_tpu.core.gating import TokenGate

        blk, _ = _make_block()
        dispatcher = BucketedThresholdStep(
            blk, lambda capacity=None: (lambda *a: None), THRESHOLD,
            capacities=[6, 12],
        )
        gates = blk.modules_of_type(TokenGate)
        dispatcher._step_for(0)
        dispatcher._step_for(1)
        assert all(g.policy._capacity == 12 for g in gates)
        dispatcher._step_for(0)  # cached — must still re-install
        assert all(g.policy._capacity == 6 for g in gates)
