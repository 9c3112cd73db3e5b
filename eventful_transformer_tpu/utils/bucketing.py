"""Capacity-bucketed dispatch for threshold policies.

The reference's TokenNormThreshold selects a VARIABLE number of tokens per
frame (policies.py:6-36) — a shape XLA cannot compile. The fixed-capacity
reformulation (core/policies.py) is exact but, at the default capacity
(= n_tokens), computes the full dense workload and only masks the counts,
so `threshold_*.yml` runs saved FLOP *counts* but no wall-clock.

This module makes the threshold configs save wall-clock: the model step is
compiled at a LADDER of capacities (one XLA program per bucket); each frame
runs at the current bucket, and the `policy_saturated` count — emitted by
TokenNormThreshold when every capacity slot of some gate is over threshold,
i.e. the selection may have truncated — triggers an ESCALATING re-run from
the same pre-frame state at the next larger bucket. Results are therefore
EXACT (identical to capacity = n_tokens) whenever the final run is
unsaturated or at full capacity; temporal smoothness (the premise of the
whole method) makes escalations rare, so most frames pay only the small
bucket's cost.

A decay probe periodically retries the next-smaller bucket so the dispatcher
tracks falling token demand too (the cost of a failed probe is one re-run).
"""

from __future__ import annotations

from eventful_transformer_tpu.core.policies import TokenNormThreshold
from eventful_transformer_tpu.utils.misc import set_policies


class BucketedThresholdStep:
    """Escalating bucketed dispatcher.

    ``build_step(capacity)``: (re)build the jitted per-frame step AFTER
    policies have been set to ``capacity``; returns a callable
    ``step(state, *args) -> (out, new_state, counts)`` where ``counts``
    includes the ``policy_saturated`` scalar (count_mode must be on).
    """

    def __init__(
        self, model, build_step, threshold, capacities, decay_interval=16
    ):
        self.model = model
        self.build_step = build_step
        self.threshold = threshold
        self.capacities = sorted(capacities)
        self.decay_interval = decay_interval
        self._steps = {}
        self._level = 0
        self._since_change = 0
        self.escalations = 0
        self.frames_per_level = [0] * len(self.capacities)

    def _step_for(self, level):
        capacity = self.capacities[level]
        # jit captures the policy's static capacity at TRACE time, and a
        # bucket's step may hold more than one lazily-traced program (the
        # flush/incremental split): a program first CALLED after another
        # bucket's set_policies would silently trace at the wrong
        # capacity. Re-install the policies on EVERY dispatch to this
        # bucket (attribute writes, negligible) so any late trace captures
        # the right capacity; already-traced programs are unaffected.
        set_policies(
            self.model,
            TokenNormThreshold,
            threshold=self.threshold,
            capacity=capacity,
        )
        if capacity not in self._steps:
            self._steps[capacity] = self.build_step(capacity)
        return self._steps[capacity]

    def reset(self):
        """Per-video reset of the dispatch heuristic (not the compiled
        steps)."""
        self._level = 0
        self._since_change = 0

    def __call__(self, state, *args):
        # Optional decay probe: periodically retry one bucket down.
        if (
            self._level > 0
            and self._since_change >= self.decay_interval
        ):
            self._level -= 1
            self._since_change = 0
        while True:
            step = self._step_for(self._level)
            out, new_state, counts = step(state, *args)
            from eventful_transformer_tpu.core.counting import count_value

            saturated = count_value(counts["policy_saturated"])
            at_top = self._level == len(self.capacities) - 1
            if saturated == 0.0 or at_top:
                self.frames_per_level[self._level] += 1
                self._since_change += 1
                return out, new_state, counts
            # truncation possible: discard, escalate, re-run exactly
            self.escalations += 1
            self._level += 1
            self._since_change = 0
