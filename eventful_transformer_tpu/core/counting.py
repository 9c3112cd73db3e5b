"""Operation counting for the TPU-native eventful-transformer framework.

The reference implementation (eventful_transformer/base.py:7-78 and
eventful_transformer/counting.py) counts FLOPs by mutating per-module
``defaultdict`` state inside ``forward``. Under JAX everything is traced once
and compiled, so counting is instead done with *traced scalars threaded
through the computation*: a :class:`Ctx` object carries a dict of count
scalars (one per canonical key); counted ops add to it during tracing. The
dict becomes part of ``lax.scan`` / ``lax.cond`` carries via the
:func:`cond` and :func:`scan` helpers so counts survive compiled control
flow. When ``count_mode`` is off the dict is empty and counting is a no-op at
trace time (zero runtime overhead).

Count-key semantics match the reference exactly (counting.py:21,47,109,
123,154,174 and modules.py:41,148,195,290):

==================== =====================================================
key                  increment
==================== =====================================================
add_flops            result.numel() per counted add
bias_flops           result.numel() per bias add
convNd_flops         result.numel() * fan_in
einsum_flops         sum of the ones-einsum (== out.numel() * contracted)
linear_flops         input.numel() * out_features
matmul_flops         result.numel() * a.shape[-1]
gate_flops           reference-state numel per incremental gate call
accumulator_flops    v_n_tilde.numel() + 2 * product.numel()
==================== =====================================================

Counts are float32 on device (relative error ~1e-7 on 1e12-scale counts,
well inside reporting precision); the host-side :class:`Counts` class mirrors
the reference's dict-with-arithmetic plus CSV / pretty-print output.
"""

from __future__ import annotations

from sys import stdout

import jax
import jax.numpy as jnp

COUNT_KEYS = (
    "accumulator_flops",
    # not a FLOP count: #gate calls whose threshold-policy capacity
    # saturated (drives bucketed dispatch escalation, utils/bucketing.py)
    "policy_saturated",
    "add_flops",
    "bias_flops",
    "conv1d_flops",
    "conv2d_flops",
    "conv3d_flops",
    "einsum_flops",
    "gate_flops",
    "linear_flops",
    "matmul_flops",
)


def zero_counts():
    """A fresh device-side counts dict (all canonical keys, zeroed).

    Each count is a (sum, compensation) float32 pair updated with Neumaier
    compensated summation in :meth:`Ctx.add`, so device-side accumulation
    stays exact to ~1 ulp of the TOTAL regardless of the number of adds
    (a plain f32 scalar drifts ~sqrt(n_adds) ulps — measurable at
    ViTDet-1024 scale, ~1e12 FLOPs/frame)."""
    return {k: jnp.zeros((2,), jnp.float32) for k in COUNT_KEYS}


def count_value(v):
    """Host-side float64 value of one device count (pair or legacy scalar)."""
    import numpy as np

    a = np.asarray(v, dtype=np.float64)
    return float(a.sum()) if a.ndim else float(a)


class Ctx:
    """Per-call context threaded through ``apply`` functions.

    Attributes:
      count_mode: static Python bool; when False, ``add`` is a no-op and the
        counts dict stays empty (stable pytree structure for scan carries).
      counts: dict of traced float32 scalars keyed by COUNT_KEYS.
      training: static Python bool (enables dropout / drop-path).
      rng: optional PRNG key for stochastic layers.
    """

    __slots__ = ("count_mode", "counts", "training", "rng")

    def __init__(self, count_mode=False, counts=None, training=False, rng=None):
        self.count_mode = count_mode
        if counts is None:
            counts = zero_counts() if count_mode else {}
        self.counts = counts
        self.training = training
        self.rng = rng

    def add(self, key, value):
        """Add ``value`` (python number or traced scalar) to count ``key``
        with Neumaier compensated summation (see :func:`zero_counts`)."""
        if self.count_mode:
            pair = self.counts[key]
            s, c = pair[0], pair[1]
            v = jnp.asarray(value, jnp.float32)
            t = s + v
            # the compensation recovers whichever operand was truncated
            c = c + jnp.where(
                jnp.abs(s) >= jnp.abs(v), (s - t) + v, (v - t) + s
            )
            self.counts[key] = jnp.stack([t, c])

    def replace_counts(self, counts):
        c = Ctx(self.count_mode, dict(counts), self.training, self.rng)
        return c

    def next_rng(self):
        """Split the context rng, returning a fresh key (training only)."""
        if self.rng is None:
            raise ValueError("Ctx.rng is required for stochastic layers")
        self.rng, sub = jax.random.split(self.rng)
        return sub


def cond(pred, true_fn, false_fn, operands, ctx):
    """``lax.cond`` that threads ``ctx.counts`` through both branches.

    ``true_fn`` / ``false_fn`` have signature ``fn(ctx, *operands) -> out``
    and must return identically-structured pytrees. This is the mechanism
    behind per-block flush-vs-incremental dispatch (the reference's per-module
    ``first`` flags, modules.py:73-76, collapse into one cond per block).
    """

    def wrap(fn):
        def g(carry):
            counts, ops = carry
            c = ctx.replace_counts(counts)
            out = fn(c, *ops)
            return c.counts, out

        return g

    counts, out = jax.lax.cond(pred, wrap(true_fn), wrap(false_fn), (ctx.counts, operands))
    ctx.counts = counts
    return out


def scan(body, ctx, init_carry, xs, length=None, unroll=1):
    """``lax.scan`` that threads ``ctx.counts`` (and a per-step rng fold).

    ``body(ctx, carry, x) -> (carry, y)``. This is how the per-frame hot loop
    (models/vivit.py:147 in the reference) becomes a single compiled scan.

    ``unroll`` (int, or True for full unroll) trades compile time for fewer
    while-loop back-edge copies of the carried eventful state — profiled at
    ~1.9 ms/frame on the ViTDet-672 path (docs/PERF_NOTES.md).
    """

    def f(carry, x):
        step, counts, inner = carry
        c = ctx.replace_counts(counts)
        if ctx.rng is not None:
            c.rng = jax.random.fold_in(ctx.rng, step)
        inner2, y = body(c, inner, x)
        return (step + 1, c.counts, inner2), y

    (_, counts, carry), ys = jax.lax.scan(
        f, (jnp.int32(0), ctx.counts, init_carry), xs, length=length,
        unroll=unroll,
    )
    ctx.counts = counts
    return carry, ys


class Counts(dict):
    """Host-side dict-with-arithmetic, mirroring the reference ``Counts``
    (eventful_transformer/base.py:7-78) including CSV and pretty output."""

    def __missing__(self, key):
        return 0

    def __add__(self, other):
        result = Counts(self)
        if isinstance(other, dict):
            for key, value in other.items():
                result[key] = result.get(key, 0) + value
        else:
            for key in result:
                result[key] += other
        return result

    __radd__ = __add__

    def __mul__(self, other):
        result = Counts(self)
        for key in result:
            result[key] *= other
        return result

    __rmul__ = __mul__

    def __neg__(self):
        return Counts({k: -v for k, v in self.items()})

    def __sub__(self, other):
        return self.__add__(-other if isinstance(other, Counts) else -other)

    def __rsub__(self, other):
        return self.__neg__().__add__(other)

    def __truediv__(self, other):
        return self.__mul__(1.0 / other)

    @classmethod
    def from_device(cls, counts):
        """Build from a device-side counts dict ((sum, comp) pairs -> floats)."""
        return cls({k: count_value(v) for k, v in counts.items()})

    def nonzero(self):
        return Counts({k: v for k, v in self.items() if v != 0})

    def csv_header(self):
        return dict_csv_header(self)

    def csv_line(self):
        return dict_csv_line(self)

    def pretty_print(self, indent=4, value_format=".3e", file=stdout, flush=False):
        print(dict_string(self, indent, value_format), file=file, flush=flush)


def dict_csv_header(x):
    return ",".join(k for k in sorted(x.keys()))


def dict_csv_line(x):
    return ",".join(f"{x[k]:g}" for k in sorted(x.keys()))


def dict_string(x, indent=4, value_format=".4g"):
    lines = []
    key_length = max(len(str(key)) for key in x.keys())
    format_str = " " * indent + f"{{:<{key_length + 1}}} {{:{value_format}}}"
    for key in sorted(x.keys()):
        lines.append(format_str.format(f"{key}:", x[key]))
    return "\n".join(lines)
