"""Counted primitive ops and tiny functional module base.

Replaces the reference's ``ExtendedModule`` + counted-op wrappers
(eventful_transformer/base.py:81-149, counting.py) with a functional design:
modules are plain Python objects holding *static* configuration; parameters
and temporal state are explicit pytrees.

Conventions:
  * ``init(key) -> params``               (pure, static shapes)
  * ``apply(ctx, params, x, ...) -> y``   (stateless modules)
  * ``apply(ctx, params, state, x) -> (y, state)``  (stateful modules)

Counting is routed through :class:`~.counting.Ctx`; ops accept an optional
``valid_frac`` (a traced scalar in [0, 1]) so masked fixed-capacity paths can
report exactly the FLOPs of the *valid* work, matching the reference's
variable-k counts (see policies in core/policies.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LN_EPS = 1e-6  # reference blocks.py:23


class Module:
    """Base for framework modules. Holds static config only."""

    def init(self, key):
        return {}

    def sub_init(self, key, named_modules):
        """Initialize a dict of named submodules with split keys."""
        keys = jax.random.split(key, len(named_modules))
        return {name: m.init(k) for (name, m), k in zip(named_modules.items(), keys)}

    def modules_of_type(self, module_type):
        """Recursively collect sub-objects of a type (the functional analog
        of reference base.py:115-122, used for policy injection)."""
        found, seen = [], set()

        def walk(obj):
            if id(obj) in seen:
                return
            seen.add(id(obj))
            for attr in vars(obj).values():
                items = attr if isinstance(attr, (list, tuple)) else [attr]
                for item in items:
                    if isinstance(item, module_type):
                        found.append(item)
                    if isinstance(item, Module):
                        walk(item)

        walk(self)
        return found


def numeric_tuple(x, length):
    """Expand a scalar into a tuple (reference base.py:152-162)."""
    return (x,) * length if isinstance(x, (int, float, complex, bool)) else tuple(x)


# ---------------------------------------------------------------------------
# Counted primitive ops (reference counting.py semantics)
# ---------------------------------------------------------------------------


def counted_add(ctx, a, b):
    """a + b, counting add_flops = result size (counting.py:9-22)."""
    result = a + b
    ctx.add("add_flops", result.size)
    return result


def counted_matmul(ctx, a, b, valid_frac=1):
    """Batched matmul counting result.numel() * a.shape[-1] (counting.py:165-175)."""
    result = jnp.matmul(a, b, preferred_element_type=a.dtype)
    ctx.add("matmul_flops", valid_frac * float(result.size * a.shape[-1]))
    return result


def counted_einsum(ctx, equation, a, b, contracted_size):
    """Einsum counting out.numel() * contracted dims (counting.py:113-124).

    The reference uses a ones-einsum trick; for the inner-product einsums used
    here that equals ``out.size * contracted_size``, which we pass statically.
    """
    result = jnp.einsum(equation, a, b)
    ctx.add("einsum_flops", result.size * contracted_size)
    return result


def layer_norm(x, params, eps=LN_EPS):
    """LayerNorm over the last axis (not counted, as in the reference where
    nn.LayerNorm is uncounted)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(dtype)


def gelu(x):
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


class LayerNorm(Module):
    def __init__(self, dim, eps=LN_EPS):
        self.dim = dim
        self.eps = eps

    def init(self, key):
        return {
            "scale": jnp.ones((self.dim,), jnp.float32),
            "bias": jnp.zeros((self.dim,), jnp.float32),
        }

    def apply(self, ctx, params, x):
        del ctx  # not counted
        return layer_norm(x, params, self.eps)


class Linear(Module):
    """Counted linear transform (reference counting.py:127-162).

    Kernel stored JAX-style as (in_features, out_features); the weight
    converter transposes torch's (out, in) layout.
    """

    def __init__(self, in_features, out_features):
        self.in_features = in_features
        self.out_features = out_features

    def init(self, key):
        scale = 1.0 / math.sqrt(self.in_features)
        kernel = jax.random.uniform(
            key, (self.in_features, self.out_features), jnp.float32, -scale, scale
        )
        return {"kernel": kernel, "bias": jnp.zeros((self.out_features,), jnp.float32)}

    def apply(self, ctx, params, x, valid_frac=1):
        y = (
            jnp.matmul(x, params["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
            + params["bias"].astype(x.dtype)
        )
        ctx.add("linear_flops", valid_frac * float(x.size * self.out_features))
        ctx.add("bias_flops", valid_frac * float(y.size))
        return y

    def apply_linear(self, ctx, params, x, valid_frac=1):
        """Matmul part only (reference CountedLinear.forward_linear)."""
        y = jnp.matmul(x, params["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
        ctx.add("linear_flops", valid_frac * float(x.size * self.out_features))
        return y

    def apply_bias(self, ctx, params, x):
        """Bias part only — used to map zero-padding into the QKV domain
        (reference counting.py:146-150, blocks.py:281)."""
        y = x + params["bias"].astype(x.dtype)
        ctx.add("bias_flops", y.size)
        return y


class Dropout(Module):
    def __init__(self, rate):
        self.rate = rate

    def apply(self, ctx, params, x):
        del params
        if not ctx.training or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(Module):
    """Stochastic depth (reference eventful_transformer/utils.py:10-29)."""

    def __init__(self, drop_rate):
        self.drop_rate = drop_rate

    def apply(self, ctx, params, x):
        del params
        if not ctx.training or self.drop_rate <= 0.0:
            return x
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep_mask = jax.random.uniform(ctx.next_rng(), shape) > self.drop_rate
        return (x / (1.0 - self.drop_rate) * keep_mask.astype(x.dtype)).astype(x.dtype)


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape).astype(dtype)
